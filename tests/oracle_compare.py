"""Order-insensitive Spark-vs-DuckDB result comparison.

Mirrors the driver's check: row count, column names (sorted), and a
value-level comparison with columns sorted by name and rows sorted by all
columns. Floats are compared to 9 decimal places (registry conventions
already round computed doubles, so this tolerance only absorbs float64
representation noise, not real differences).
"""

from __future__ import annotations

import math
from decimal import Decimal

import pandas as pd


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(9)
        elif s.dtype == object:
            df[c] = s.map(lambda v: round(float(v), 9) if isinstance(v, Decimal) else v)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_same(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, key: str) -> None:
    assert len(spark_pdf) == len(duck_pdf), (
        f"{key}: row count {len(spark_pdf)} (spark) != {len(duck_pdf)} (duckdb)"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{key}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9), (
                    f"{key}: col {col} row {i}: {x!r} != {y!r}"
                )
            else:
                assert x == y, f"{key}: col {col} row {i}: {x!r} != {y!r}"
