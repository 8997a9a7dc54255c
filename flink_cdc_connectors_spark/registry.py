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
# Round-10 set (VERDICT r9 "Next round" #2): (0) keys whose source files
# round 10 touches — the token-count null guard + the sim-search plan-build
# fix (tier_c.py), the GEMM-caveat files (tier_c_ext3/ext4), and the
# streaming-harness keys item #3 reworks; (1) the 19 keys whose newest
# driver row is round 6, the oldest surviving evidence; (2) r7-evidence
# keys with the largest bench weight, filling the ~50 budget.
_CHECK_FIRST = (
    # -- 0: implementation/source files changed this round -------------------
    "ext_token_count",
    "ext_sim_search_pq",
    "ext_semdedup",
    "ext_dedup_embedding_lsh",
    "cdc_stream_dedup_index",
    "stream_e2e_windowed",
    "cdc_dsv2_added_tables",
    "cdc_dsv2_stream",
    # -- 1: the 19 keys whose newest driver row is round 6 -------------------
    "ext_dedup_minhash",
    "ext_sim_search_cosine",
    "ext_sim_search_ivf",
    "ext_sim_search_lsh",
    "ext_tfidf",
    "ext_url_dedup",
    "ext_zorder_layout",
    "join_anti",
    "join_lookup",
    "stream_tumbling_window",
    "stream_watermark_late",
    "topk_per_group",
    "udf_scalar",
    "udf_table",
    "window_analytic",
    "window_range_frame",
    "window_ranking",
    # (ext_semdedup / stream_e2e_windowed already in group 0)
    # -- 2: r7-evidence keys, heaviest bench weight first, to ~50 ------------
    "ext_dedup_incremental",
    "ext_dedup_ngram_jaccard",
    "cdc_deserialize_envelope",
    "stream_topn_changelog",
    "cdc_metadata_columns",
    "cdc_chunk_split_uneven",
    "cdc_chunk_reconcile",
    "cdc_chunk_split_vector",
    "ext_multimodal_decode",
    "cdc_offset_filter",
    "cdc_startup_modes",
    "cdc_dedup_exact",
    "cdc_spatial_decode",
    "set_ops_bag",
    "join_skew_salted",
    "ext_fingerprint",
    "cdc_chunk_split_even",
    "cdc_chunk_key_column",
    "agg_distinct",
    "set_except",
    "ext_multimodal_resize",
    "subquery_in_correlated",
    "cdc_changelog_normalize",
    "stream_window_join",
    "ext_lang_id",
    "ext_quality_score",
    # -- r7+ greens follow in sorted order; rows-only keys at the tail --
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
    # so they sit where a driver cap would trim first.  (Since round 10
    # every key carries a value oracle — the xxhash64 keys were the last
    # rows-only pair — so the oracle-None term is currently vacuous; it
    # stays as the policy for any future rows-only addition.)
    for k in sorted(_REGISTRY, key=lambda k: (_REGISTRY[k].oracle is None, k)):
        ordered.setdefault(k, _REGISTRY[k])
    return ordered


def get(key: str) -> QuerySpec:
    return all_queries()[key]
