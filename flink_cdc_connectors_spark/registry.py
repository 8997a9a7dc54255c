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
# Round-8 set (VERDICT r7 "Next round" #1): (0) keys whose source files
# round 8 touches — the newly-added-table flag gate (datasource.py /
# ddl.py), the exact-count rechunk (hybrid_source.py), the deduped
# shingle hashes (tier_c_ext6.py), and the scratch-cleanup path
# (tier_a_ext2.py) — fresh rows are the only current evidence for these;
# (1) the 17 keys whose newest driver row is round 4, the oldest
# surviving evidence (joins, scalars, scan/set, multimodal image/video,
# simhash); (2) r5-evidence keys, prioritizing the two round-8 perf
# targets (cdc_schema_evolution regression re-anchor,
# cdc_changelog_mode_upsert ladder re-probe), filling the ~50 budget.
_CHECK_FIRST = (
    # -- 0: implementation/source files changed this round -------------------
    "cdc_dsv2_added_tables",
    "cdc_dsv2_stream",
    "cdc_type_change_resnapshot",
    "cdc_newly_added_tables",
    "cdc_sql_ddl_source",
    "cdc_sql_ddl_join",
    "cdc_stream_dedup_index",
    "ext_curation_pipeline",
    # -- 1: the 17 keys whose newest driver row is round 4 -------------------
    "ext_dedup_simhash",
    "ext_multimodal_image",
    "ext_multimodal_video",
    "join_broadcast",
    "join_full_outer",
    "join_inner",
    "join_left_multi",
    "join_range",
    "join_semi",
    "scalar_conditional",
    "scalar_date",
    "scalar_json",
    "scalar_math",
    "scalar_string",
    "scalar_typecast",
    "scan_project",
    "set_distinct_union",
    # -- 2: oldest (r5) evidence, round-8 perf targets first, to ~50 ---------
    "cdc_schema_evolution",
    "cdc_changelog_mode_upsert",
    "agg_approx_percentile",
    "agg_arg_extremes",
    "agg_cube",
    "agg_filter_where",
    "agg_grouping_sets",
    "agg_skew_salted",
    "cdc_chunk_split_region",
    "cdc_chunk_split_sampled",
    "cdc_decimal_handling",
    "cdc_envelope_retract_agg",
    "cdc_format_roundtrip",
    "cdc_heartbeat",
    "cdc_mongo_copy_existing",
    "cdc_mongo_update_lookup",
    "cdc_multi_table_route",
    "cdc_pgoutput_relation",
    "cdc_server_timezone",
    "cdc_tikv_two_phase",
    "cdc_txn_metadata",
    "join_colocated_bucketed",
    "join_interval",
    "join_temporal_asof",
    "pattern_funnel",
    # -- r5+ greens follow in sorted order; rows-only keys at the tail --
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
