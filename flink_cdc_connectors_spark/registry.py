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
# Round-5 set (VERDICT r4 "Next round" #2): the union of driver rounds
# 1-4 covers all keys green, so the budget now lands on (0) the new
# round-5 keys (no driver row can exist yet) and (1) the 49 keys whose
# NEWEST driver row is round 2 — the oldest surviving evidence (exact
# list = keys absent from CORRECTNESS_r03 and _r04). 52 listed keys
# slightly overfill the ~50 budget; the tail-most r2 keys may slip to
# round 6, each still holding a green r2 row.
_CHECK_FIRST = (
    # -- 0: new round-5 keys ----------------------------------------------
    "cdc_decimal_handling",
    "cdc_server_timezone",
    "cdc_pgoutput_relation",
    "cdc_tikv_two_phase",
    "cdc_mongo_copy_existing",
    "cdc_mongo_update_lookup",
    "cdc_changelog_mode_upsert",
    "ext_curation_pipeline",
    "cdc_stream_dedup_index",
    # -- 1: the 49 keys whose newest driver row is round 2 ----------------
    "agg_approx_percentile",
    "agg_arg_extremes",
    "agg_cube",
    "agg_filter_where",
    "agg_grouping_sets",
    "agg_skew_salted",
    "cdc_chunk_split_region",
    "cdc_chunk_split_sampled",
    "cdc_envelope_retract_agg",
    "cdc_format_roundtrip",
    "cdc_heartbeat",
    "cdc_multi_table_route",
    "cdc_newly_added_tables",
    "cdc_schema_evolution",
    "cdc_sql_ddl_join",
    "cdc_sql_ddl_source",
    "cdc_txn_metadata",
    "ext_decontaminate",
    "ext_dedup_cluster",
    "ext_dedup_substring",
    "ext_doc_chunk",
    "ext_domain_mix",
    "ext_filter_ensemble",
    "ext_multimodal_frames",
    "ext_pii_scrub",
    "ext_repetition_ratio",
    "ext_sequence_pack",
    "ext_shuffle_shard",
    "ext_stratified_sample",
    "ext_unigram_logprob",
    "join_colocated_bucketed",
    "join_interval",
    "join_temporal_asof",
    "pattern_funnel",
    "set_intersect",
    "set_union_all",
    "sort_limit",
    "stream_cumulate_window",
    "stream_join_static",
    "stream_session_window",
    "stream_sliding_window",
    "stream_tumbling_window",
    "stream_watermark_late",
    "topk_per_group",
    "udf_scalar",
    "udf_table",
    "window_analytic",
    "window_range_frame",
    "window_ranking",
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
