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


_REGISTRY: dict[str, QuerySpec] = {}


def query(
    key: str,
    tier: str,
    oracle: str | None = None,
    oracle_max_docs: int | None = None,
) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder under a SURVEY.md §2 key."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in _REGISTRY:
            raise ValueError(f"duplicate query key: {key}")
        _REGISTRY[key] = QuerySpec(
            key, tier, fn, oracle, (fn.__doc__ or "").strip(), oracle_max_docs
        )
        return fn

    return deco


def oracle_valid_at(spec: QuerySpec, n_docs: int) -> bool:
    """True when ``spec``'s value oracle is comparable for a fixture whose
    ``documents`` table holds ``n_docs`` rows (the corpus-gate contract
    above).  Harnesses call this before a value comparison; every driver
    fixture (sf0.001-0.1, 50-5000 docs) is far below every gate, so this
    only bites synthetic scale fixtures."""
    return spec.oracle_max_docs is None or n_docs <= spec.oracle_max_docs


# Driver coverage cap: each round's CORRECTNESS_r{N}.json compares only the
# first ~50 keys of the emitted query dict, in insertion order.  Keys listed
# here are emitted FIRST (in this order) so the bounded driver budget lands
# on the keys with the weakest existing evidence; if the driver ever sorts
# instead, the ordering is a no-op.  Everything not listed follows in
# sorted order.
#
# Round-11 set (VERDICT r10 "Next round" #1): (0) ext_dedup_simhash — the
# ONLY key in the repo's history with zero driver hash evidence (its
# xxhash64 oracle landed after the r10 sample was drawn); (1) the 17 keys
# whose newest driver row is round 7, the oldest surviving evidence;
# (2) keys whose builders/oracles round 11 touches — the recall-family
# switch, the streaming-sink localization, the GEMM HALF_UP rounding, and
# the gate-flagged keys; (3) the four r10 loaded-window bench movers so
# the driver refreshes their evidence alongside the quiet re-timing;
# (4) r8-evidence keys, heaviest bench weight first, filling ~50.
_CHECK_FIRST = (
    # -- 0: the one key with no driver hash row ever --------------------------
    "ext_dedup_simhash",
    # -- 1: the 17 keys whose newest driver row is round 7 --------------------
    "agg_global",
    "agg_groupby",
    "agg_having",
    "agg_rollup",
    "array_ops",
    "cdc_snapshot_scan",
    "cdc_table_discovery",
    "ext_quality_score",
    "ext_text_stats",
    "filter_pred",
    "map_ops",
    "pivot_agg",
    "stream_dedup_keep_first",
    "subquery_not_in",
    "subquery_scalar",
    "window_first_last",
    "window_ntile_dist",
    # -- 2: implementation/oracle files changed this round --------------------
    "ext_minhash_recall",
    "stream_e2e_windowed",
    "ext_dedup_minhash",
    "ext_fingerprint",
    "ext_sim_search_cosine",
    "ext_sim_search_lsh",
    "ext_sim_search_pq",
    "ext_dedup_embedding",
    "ext_dedup_embedding_lsh",
    "ext_semdedup",
    # -- 3: the four r10 loaded-window bench movers ---------------------------
    "cdc_tikv_two_phase",
    "cdc_changelog_mode_upsert",
    "cdc_envelope_retract_agg",
    "cdc_dsv2_stream",
    # -- 4: r8-evidence keys, heaviest bench weight first, to ~50 -------------
    "cdc_format_roundtrip",
    "ext_curation_pipeline",
    "cdc_multi_table_route",
    "agg_approx_percentile",
    "cdc_mongo_update_lookup",
    "cdc_newly_added_tables",
    "cdc_pgoutput_relation",
    "cdc_schema_evolution",
    "join_colocated_bucketed",
    "cdc_decimal_handling",
    "cdc_mongo_copy_existing",
    "cdc_chunk_split_sampled",
    "agg_arg_extremes",
    "cdc_chunk_split_region",
    "join_left_multi",
    "cdc_server_timezone",
    "agg_cube",
    "scalar_math",
    # -- r8+ greens follow in sorted order; rows-only keys at the tail --
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
