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
# Round-7 set (VERDICT r6 "Next round" #2): (0) the new round-7 key (no
# driver row can exist yet); (1) keys whose implementation changed this
# round — the schema_epoch tie-break in changelog_normalize + the DSv2
# offset v3 / keyRanges work touch the source files these keys execute,
# so fresh rows are the only current evidence; (2) the 13 keys whose
# newest driver row is round 3 — the oldest surviving evidence; (3) the
# oldest r4-evidence keys, sorted, filling the ~50 budget.
_CHECK_FIRST = (
    # -- 0: new round-7 keys ------------------------------------------------
    "cdc_dsv2_added_tables",
    "ext_multimodal_resize",
    # -- 1: implementation/source files changed this round -------------------
    "cdc_type_change_resnapshot",
    "cdc_newly_added_tables",
    "cdc_dsv2_stream",
    "cdc_stream_dedup_index",
    "cdc_metadata_columns",
    "ext_curation_pipeline",
    # -- 2: the 13 keys whose newest driver row is round 3 -------------------
    "join_skew_salted",
    "map_ops",
    "pivot_agg",
    "set_except",
    "set_ops_bag",
    "stream_dedup_keep_first",
    "stream_topn_changelog",
    "stream_window_join",
    "subquery_in_correlated",
    "subquery_not_in",
    "subquery_scalar",
    "window_first_last",
    "window_ntile_dist",
    # -- 3: oldest (r4) evidence, sorted, to the ~50 budget -------------------
    "agg_distinct",
    "agg_global",
    "agg_groupby",
    "agg_having",
    "agg_rollup",
    "array_ops",
    "cdc_changelog_normalize",
    "cdc_chunk_key_column",
    "cdc_chunk_reconcile",
    "cdc_chunk_split_even",
    "cdc_chunk_split_uneven",
    "cdc_chunk_split_vector",
    "cdc_dedup_exact",
    "cdc_deserialize_envelope",
    "cdc_offset_filter",
    "cdc_snapshot_scan",
    "cdc_spatial_decode",
    "cdc_startup_modes",
    "cdc_table_discovery",
    "ext_dedup_exact_text",
    "ext_dedup_incremental",
    "ext_dedup_ngram_jaccard",
    "ext_fingerprint",
    "ext_lang_id",
    "ext_multimodal_decode",
    "ext_quality_score",
    "ext_text_stats",
    "ext_token_count",
    "filter_pred",
    "scalar_conditional",
    # -- r4/r5 greens follow in sorted order; rows-only keys at the tail --
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
