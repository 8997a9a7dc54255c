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
# Round-13 set (VERDICT r12 "Next round" #1): the r12 correctness sample
# was frozen BEFORE the r12 optimization edits, so 18 of the 23 keys that
# round rewrote have driver-level hash evidence only from r11 or older.
# (1) the r12-touched keys, semantics-riskiest first (join_lookup's
# union-as-of rewrite, ext_minhash_recall's hashed exact-Jaccard, the
# wire-format single-parse family), then the rewritten ext_dedup/* and
# ext_sim_search/* families; (2) the keys round 13 touches (this round's
# single-parse conversions + the dedup-cluster loop), so CORRECTNESS_r13
# hash-verifies BOTH optimization rounds' rewrites in one sample.
_CHECK_FIRST = (
    # -- 1: round-12 rewrites, riskiest first ---------------------------------
    "join_lookup",
    "ext_minhash_recall",
    "cdc_format_roundtrip",
    "cdc_changelog_mode_upsert",
    "cdc_tikv_two_phase",
    "cdc_stream_dedup_index",
    "ext_ann_recall",
    "ext_dedup_minhash",
    "ext_dedup_simhash",
    "ext_dedup_incremental",
    "ext_dedup_ngram_jaccard",
    "ext_dedup_cluster",
    "ext_dedup_keeper_quality",
    "ext_dedup_embedding",
    "ext_dedup_embedding_lsh",
    "ext_sim_search_cosine",
    "ext_sim_search_ivf",
    "ext_sim_search_lsh",
    "ext_sim_search_pq",
    "ext_semdedup",
    "ext_kmeans_spherical",
    "ext_curation_pipeline",
    "ext_tfidf",
    # -- 2: round-13 touched keys ----------------------------------------------
    "cdc_jdbc_incremental",
    "cdc_mongo_copy_existing",
    "cdc_mongo_update_lookup",
    "cdc_pgoutput_relation",
    "cdc_newly_added_tables",
    "cdc_multi_table_route",
    "cdc_type_change_resnapshot",
    "cdc_chunk_split_sampled",
    # -- 3: consumers of the helpers round 13 converted to single-parse
    # forms (sources/envelope.py codec, tier_a_ext._logged,
    # operators/cdc.changelog_normalize + chunk_reconcile) — every one is
    # oracle-pinned in pytest; listing them here puts driver-level hash
    # rows behind the shared-helper rewrites too.
    "cdc_deserialize_envelope",
    "cdc_envelope_retract_agg",
    "cdc_metadata_columns",
    "cdc_schema_evolution",
    "cdc_chunk_reconcile",
    "cdc_upsert_sink",
    "cdc_heartbeat",
    "cdc_capture_sqlserver",
    "cdc_capture_db2",
    "cdc_logminer_redo",
    "cdc_postgres_wal2json",
    "cdc_oceanbase_commit_order",
    "cdc_gtid_failover",
    "cdc_mongo_changestream",
    # -- r12-sampled greens and the rest follow in sorted order ---------------
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
