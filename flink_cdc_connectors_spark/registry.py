"""Query registry — the driver-checked correctness contract.

One entry per SURVEY.md §2 query key. Each spec carries:
  - ``builder(spark, sf_dir) -> DataFrame``: the Spark-first implementation,
  - ``oracle``: equivalent DuckDB SQL over the same parquet views (None for
    non-SQL-expressible ops -> driver records a rows-only check),
  - ``tier``: 'A' (CDC semantics), 'B' (relational/streaming surface),
    'C' (LLM-pipeline extensions).

Cross-engine determinism conventions (applied on BOTH sides):
  - every computed column is aliased identically,
  - double aggregates are rounded (round(x, N)) so float summation-order
    differences between Spark and DuckDB can't flip the value hash,
  - integer sums are cast to BIGINT (DuckDB sums ints to HUGEINT),
  - timestamps in compared output are formatted to 'yyyy-MM-dd HH:mm:ss'
    strings (stable across engine timezone/precision differences).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERY_MODULES = (
    "flink_cdc_connectors_spark.queries.tier_a",
    "flink_cdc_connectors_spark.queries.tier_b",
    "flink_cdc_connectors_spark.queries.tier_c",
)


@dataclass(frozen=True)
class QuerySpec:
    key: str
    tier: str
    builder: QueryFn
    oracle: str | None
    doc: str


_REGISTRY: dict[str, QuerySpec] = {}


def query(key: str, tier: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder under a SURVEY.md §2 key."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in _REGISTRY:
            raise ValueError(f"duplicate query key: {key}")
        _REGISTRY[key] = QuerySpec(key, tier, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return dict(_REGISTRY)


def get(key: str) -> QuerySpec:
    return all_queries()[key]
