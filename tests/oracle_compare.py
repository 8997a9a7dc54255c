"""Order-insensitive Spark-vs-DuckDB result comparison.

Mirrors the driver's check: row count, column names (sorted), and a
value-level comparison with columns sorted by name and rows sorted by all
columns. Floats are compared to 9 decimal places (registry conventions
already round computed doubles, so this tolerance only absorbs float64
representation noise, not real differences).

DTYPE-STRICT: the driver hashes raw values, so a Spark DECIMAL vs oracle
DOUBLE column hash-mismatches even when the numbers are identical (this is
exactly how the round-1 cdc_retract_agg failure shipped while local tests
were green).  _type_class assigns every column a representation class and
assert_same fails on any class mismatch BEFORE comparing values — local
green must predict driver green.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import pandas as pd


def _type_class(s: pd.Series) -> str:
    """Representation class of a column as the driver's value-hash sees it."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    # object columns: classify by the first non-null value
    for v in s:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        if isinstance(v, Decimal):
            return "decimal"
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, int):
            return "int"
        if isinstance(v, float):
            return "float"
        if isinstance(v, str):
            return "str"
        if isinstance(v, (datetime.datetime, pd.Timestamp)):
            return "datetime"
        if isinstance(v, datetime.date):
            return "date"
        if isinstance(v, (list, tuple)):
            return "array"
        if isinstance(v, dict):
            return "map"
        return type(v).__name__
    return "all-null"


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
    # Representation strictness: the driver hashes raw values, so Decimal vs
    # float (or date vs datetime, int vs float) is a driver failure even when
    # the numbers match.  "all-null" matches anything.
    for col in sorted(spark_pdf.columns):
        ta, tb = _type_class(spark_pdf[col]), _type_class(duck_pdf[col])
        if "all-null" in (ta, tb):
            continue
        assert ta == tb, (
            f"{key}: col {col} representation mismatch: spark={ta} oracle={tb} "
            f"(driver value-hash would reject this even if values are equal)"
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
