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
    # Oracle validity gate (ADVICE r10): some builders switch hash FAMILY
    # past a corpus-size engine gate (e.g. ext_dedup_minhash's word-triple
    # family, ext_fingerprint's xxhash64 family), and the DuckDB oracle
    # replays only the sub-gate family.  When set, the value oracle is
    # valid ONLY while count(documents) <= oracle_max_docs; a comparison
    # harness must skip/flag the value check above it instead of reporting
    # a false mismatch.  None = the oracle is valid at every corpus size
    # (engine gates that are value-identical across the gate stay None).
    oracle_max_docs: int | None = None
    # Same contract over count(embeddings) (round 12, VERDICT r11 #4):
    # the vector keys whose LSH-parameter formulas widen past a corpus
    # point (ext_dedup_embedding_lsh's plane count, ext_semdedup's cell
    # count) have static oracles valid only below it.  Previously these
    # were runtime warnings only — machine-unreadable to a harness.
    oracle_max_embeddings: int | None = None


_REGISTRY: dict[str, QuerySpec] = {}


def query(
    key: str,
    tier: str,
    oracle: str | None = None,
    oracle_max_docs: int | None = None,
    oracle_max_embeddings: int | None = None,
) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder under a SURVEY.md §2 key."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in _REGISTRY:
            raise ValueError(f"duplicate query key: {key}")
        _REGISTRY[key] = QuerySpec(
            key,
            tier,
            fn,
            oracle,
            (fn.__doc__ or "").strip(),
            oracle_max_docs,
            oracle_max_embeddings,
        )
        return fn

    return deco


def oracle_valid_at(
    spec: QuerySpec, n_docs: int, n_embeddings: int | None = None
) -> bool:
    """True when ``spec``'s value oracle is comparable for a fixture whose
    ``documents`` table holds ``n_docs`` rows and whose ``embeddings``
    table holds ``n_embeddings`` (the corpus-gate contract above).
    Harnesses call this before a value comparison; every driver fixture
    (sf0.001-0.1, 500-5000 docs / 500-2000 embeddings) is far below every
    gate, so this only bites synthetic scale fixtures.  When a spec
    carries an embeddings gate and the caller didn't supply the count,
    the answer is conservatively False — skipping a valid compare is
    recoverable, reporting a false mismatch is not."""
    if spec.oracle_max_docs is not None and n_docs > spec.oracle_max_docs:
        return False
    if spec.oracle_max_embeddings is not None and (
        n_embeddings is None or n_embeddings > spec.oracle_max_embeddings
    ):
        return False
    return True


# Driver coverage cap: each round's CORRECTNESS_r{N}.json compares only the
# first ~50 keys of the emitted query dict, in insertion order.  Keys listed
# here are emitted FIRST (in this order) so the bounded driver budget lands
# on the keys with the weakest existing evidence; if the driver ever sorts
# instead, the ordering is a no-op.  Everything not listed follows in
# sorted order.
#
# Round-12 set (VERDICT r11 "Next round" #1): (1) the 24 keys whose newest
# driver row is round 8 — the oldest surviving evidence after the r11
# rotation — ordered by BENCH_QUIET_r11 per-key weight, heaviest first;
# (2) cdc_stream_dedup_index, the heaviest suite key, whose r11 quiet pair
# sat above its r10 band without an era-verdict row (VERDICT r11 "What's
# wrong" #3) — a fresh driver row lands alongside this round's ABAB
# adjudication; (3) r9-evidence keys, heaviest quiet weight first, to ~50.
_CHECK_FIRST = (
    # -- 1: the 24 keys whose newest driver row is round 8, heaviest first ----
    "cdc_txn_metadata",
    "agg_grouping_sets",
    "join_range",
    "scalar_json",
    "join_full_outer",
    "scalar_typecast",
    "agg_skew_salted",
    "cdc_sql_ddl_source",
    "ext_multimodal_image",
    "join_temporal_asof",
    "join_broadcast",
    "cdc_sql_ddl_join",
    "pattern_funnel",
    "agg_filter_where",
    "ext_multimodal_video",
    "cdc_heartbeat",
    "join_interval",
    "join_inner",
    "join_semi",
    "set_distinct_union",
    "scalar_date",
    "scalar_string",
    "scan_project",
    "scalar_conditional",
    # -- 2: this round's adjudication target (r11 What's-wrong #3) ------------
    "cdc_stream_dedup_index",
    # -- 3: r9-evidence keys, heaviest quiet weight first, to ~50 -------------
    "ext_ann_recall",
    "ext_dedup_keeper_quality",
    "ext_bloom_decontaminate",
    "ext_kmeans_spherical",
    "cdc_type_change_resnapshot",
    "ext_dedup_lines",
    "ext_sequence_pack",
    "cdc_jdbc_incremental",
    "cdc_mongo_changestream",
    "ext_dedup_cluster",
    "ext_filter_ensemble",
    "ext_decontaminate",
    "agg_approx_distinct",
    "ext_dedup_substring",
    "cdc_capture_sqlserver",
    "cdc_capture_db2",
    "cdc_upsert_sink",
    "ext_unigram_logprob",
    "agg_percentiles",
    "cdc_postgres_wal2json",
    "cdc_oceanbase_commit_order",
    "agg_continuous_rollup",
    "cdc_logminer_redo",
    "cdc_gtid_failover",
    "ext_domain_mix",
    # -- r9+ greens follow in sorted order; rows-only keys at the tail --
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
