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
    "flink_cdc_connectors_spark.queries.tier_a_ext",
    "flink_cdc_connectors_spark.queries.tier_a_ext2",
    "flink_cdc_connectors_spark.queries.tier_b",
    "flink_cdc_connectors_spark.queries.tier_b_ext",
    "flink_cdc_connectors_spark.queries.tier_c",
    "flink_cdc_connectors_spark.queries.tier_c_ext",
    "flink_cdc_connectors_spark.queries.tier_c_ext3",
    "flink_cdc_connectors_spark.queries.tier_c_ext4",
    "flink_cdc_connectors_spark.queries.tier_c_ext5",
    "flink_cdc_connectors_spark.queries.tier_c_ext6",
    "flink_cdc_connectors_spark.queries.capstone",
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


# Driver coverage cap: each round's CORRECTNESS_r{N}.json compares only the
# first ~50 keys of the emitted query dict, in insertion order.  Keys listed
# here are emitted FIRST (in this order) so the bounded driver budget lands
# on the keys with the weakest existing evidence; if the driver ever sorts
# instead, the ordering is a no-op.  Everything not listed follows in
# sorted order.
#
# Round-6 set (VERDICT r5 "Next round" #2): (0) the new round-6 key (no
# driver row can exist yet); (1) keys whose implementation or oracle
# CHANGED this round — their newest green row predates the change, so a
# fresh row is the only current evidence (datasource restore fix, the
# minhash/SRP scale work, the shared ANN-cap oracles, the envelope-
# derived metadata projection); (2) the 8 keys whose newest driver row
# is round 2 — the oldest surviving evidence; (3) the oldest r3-evidence
# keys, sorted, filling the ~50 budget (the 13 tail-most r3 keys slip to
# round 7, each still holding a green r3 row).
_CHECK_FIRST = (
    # -- 0: new round-6 key -------------------------------------------------
    "cdc_type_change_resnapshot",
    # -- 1: changed this round ----------------------------------------------
    "cdc_metadata_columns",
    "cdc_dsv2_stream",
    "cdc_stream_dedup_index",
    "ext_dedup_minhash",
    "ext_dedup_embedding_lsh",
    "ext_sim_search_lsh",
    "ext_sim_search_cosine",
    "ext_sim_search_ivf",
    "ext_sim_search_pq",
    "ext_ann_recall",
    "stream_e2e_windowed",
    # -- 2: the 8 keys whose newest driver row is round 2 --------------------
    "stream_tumbling_window",
    "stream_watermark_late",
    "topk_per_group",
    "udf_scalar",
    "udf_table",
    "window_analytic",
    "window_range_frame",
    "window_ranking",
    # -- 3: oldest (r3) evidence, sorted, to the budget ----------------------
    "agg_approx_distinct",
    "agg_continuous_rollup",
    "agg_percentiles",
    "agg_string_agg",
    "cdc_capture_db2",
    "cdc_capture_sqlserver",
    "cdc_gtid_failover",
    "cdc_jdbc_incremental",
    "cdc_jdbc_snapshot",
    "cdc_logminer_redo",
    "cdc_mongo_changestream",
    "cdc_oceanbase_commit_order",
    "cdc_postgres_wal2json",
    "cdc_retract_agg",
    "cdc_upsert_sink",
    "explode_unnest",
    "ext_bloom_decontaminate",
    "ext_dedup_embedding",
    "ext_dedup_keeper_quality",
    "ext_dedup_lines",
    "ext_kmeans_spherical",
    "ext_minhash_recall",
    "ext_multimodal_audio",
    "ext_multimodal_cols",
    "ext_semdedup",
    "ext_tfidf",
    "ext_url_dedup",
    "ext_zorder_layout",
    "join_anti",
    "join_lookup",
    # -- r3/r4 greens follow in sorted order; rows-only keys at the tail --
)


def all_queries() -> dict[str, QuerySpec]:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    ordered: dict[str, QuerySpec] = {}
    for k in _CHECK_FIRST:
        if k in _REGISTRY:
            ordered[k] = _REGISTRY[k]
    # remaining oracle-bearing keys (hash-checkable) before rows-only ones,
    # each group sorted — rows-only keys yield the weakest driver evidence,
    # so they sit where a driver cap would trim first
    for k in sorted(_REGISTRY, key=lambda k: (_REGISTRY[k].oracle is None, k)):
        ordered.setdefault(k, _REGISTRY[k])
    return ordered


def get(key: str) -> QuerySpec:
    return all_queries()[key]
