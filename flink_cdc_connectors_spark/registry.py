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
# Round-9 set (VERDICT r8 "Next round" #2): (0) keys whose source files
# round 9 touches — the IVF-PQ GEMM scale path (tier_c_ext3.py, shares a
# file with doc_chunk/substring/unigram/frames) and its recall companion,
# plus the resnapshot rechunk guard (hybrid_source.py) — fresh rows are
# the only current evidence for these; (1) the 20 keys whose newest
# driver row is round 5, the oldest surviving evidence; (2) r6-evidence
# keys with the largest bench weight, filling the ~50 budget.
_CHECK_FIRST = (
    # -- 0: implementation/source files changed this round -------------------
    "ext_sim_search_pq",
    "ext_ann_recall",
    "ext_doc_chunk",
    "ext_dedup_substring",
    "ext_unigram_logprob",
    "ext_multimodal_frames",
    "cdc_type_change_resnapshot",
    # -- 1: the 20 keys whose newest driver row is round 5 -------------------
    "ext_decontaminate",
    "ext_dedup_cluster",
    "ext_domain_mix",
    "ext_filter_ensemble",
    "ext_pii_scrub",
    "ext_repetition_ratio",
    "ext_sequence_pack",
    "ext_shuffle_shard",
    "ext_stratified_sample",
    "set_intersect",
    "set_union_all",
    "sort_limit",
    "stream_cumulate_window",
    "stream_join_static",
    "stream_session_window",
    "stream_sliding_window",
    # -- 2: r6-evidence keys, heaviest bench weight first, to ~50 ------------
    "cdc_stream_dedup_index",
    "ext_minhash_recall",
    "cdc_jdbc_incremental",
    "cdc_jdbc_snapshot",
    "agg_approx_distinct",
    "agg_continuous_rollup",
    "agg_percentiles",
    "agg_string_agg",
    "cdc_capture_db2",
    "cdc_capture_sqlserver",
    "cdc_gtid_failover",
    "cdc_logminer_redo",
    "cdc_mongo_changestream",
    "cdc_oceanbase_commit_order",
    "cdc_postgres_wal2json",
    "cdc_retract_agg",
    "cdc_upsert_sink",
    "explode_unnest",
    "ext_bloom_decontaminate",
    "ext_dedup_embedding",
    "ext_dedup_embedding_lsh",
    "ext_dedup_exact_text",
    "ext_dedup_keeper_quality",
    "ext_dedup_lines",
    "ext_kmeans_spherical",
    "ext_multimodal_audio",
    "ext_multimodal_cols",
    "ext_semdedup",
    "ext_sim_search_cosine",
    "ext_sim_search_ivf",
    "ext_sim_search_lsh",
    # -- r6+ greens follow in sorted order; rows-only keys at the tail --
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
