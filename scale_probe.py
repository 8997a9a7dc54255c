#!/usr/bin/env python
"""10x scale probe for the full-corpus dedup/ANN family.

Builds a synthetic sf1 fixture (10x the sf0.1 documents/embeddings — each
replica id-shifted and content-perturbed so replicas are DISTINCT corpus
mass, not planted duplicates: texts get a replica prefix, embeddings a
circular component shift that preserves unit norm), then times each
family query at sf0.1 and sf1 through the noop sink and prints per-query
scaling factors. A scale-safe operator (shuffle keyed on bounded-
cardinality bands/buckets/cells, no all-pairs) should land near the data
ratio (~10x, modulo fixed overheads amortizing DOWN); anything clearly
superlinear is a candidate-blowup or skew bug.

Usage: python scale_probe.py [--rebuild]   (fixture cached under /tmp)
Output: one JSON line {query: {sf01: s, sf1: s, ratio: r}, ...} plus a
markdown table on stderr for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from flink_cdc_connectors_spark.registry import all_queries
from flink_cdc_connectors_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
REPLICAS = 10
# id shift per replica: above the sf0.1 id range, below the _COPY_OFFSET
# (1M) the dedup queries use for their planted pairs
SHIFT = 100_000

# events-based keys probed against the replicated events fixture: the
# capture-format decodes (per-key lag windows — key count scales, window
# depth constant), commit-order framing, GTID containment, z-order
# layout, and the salted skew join (customer dim copied verbatim)
EVENTS_FAMILY = [
    "cdc_logminer_redo",
    # round-5 additions: TiKV 2PC matching (two (key,start_ts) equi-joins
    # + PK window), the copy.existing copy/tail merge (two PK windows),
    # and the stream-maintained dedup index (real micro-batch drain)
    "cdc_tikv_two_phase",
    "cdc_mongo_copy_existing",
    "cdc_stream_dedup_index",
    "cdc_pgoutput_relation",
    # round-5 deserializer/mode keys: decimal wire decode, two-zone
    # temporal decode, updateLookup batch-boundary images, changelog-mode
    # retract-vs-upsert convergence
    "cdc_decimal_handling",
    "cdc_server_timezone",
    "cdc_mongo_update_lookup",
    "cdc_changelog_mode_upsert",
    # round-6 additions: the type-change re-snapshot stitch (two epoch
    # normalizes + full-outer) and the envelope-projected metadata key
    # (snapshot + binlog envelopes through one from_json)
    "cdc_type_change_resnapshot",
    "cdc_metadata_columns",
    # round-7 addition: the checkpointed newly-added-tables protocol key
    # (two Structured Streaming runs; backfill chunk-parallel)
    "cdc_dsv2_added_tables",
    "cdc_capture_sqlserver",
    "cdc_capture_db2",
    "cdc_mongo_changestream",
    "cdc_postgres_wal2json",
    "cdc_oceanbase_commit_order",
    "cdc_gtid_failover",
    "ext_zorder_layout",
    "join_skew_salted",
    # round-4 additions: splitVector byte chunking (bucketed prefix sum)
    # and the WKB->GeoJSON decode (map-only, user-count scales)
    "cdc_chunk_split_vector",
    "cdc_spatial_decode",
]

# relational (TPC-H-shaped) keys probed against replicated fact tables:
# lineitem/orders scale 10x with fresh orderkeys, the customer DIM stays
# verbatim (facts grow, dims don't — per-custkey order counts deepen 10x,
# the realistic growth mode for the fact⋈dim join and the per-key top-k)
RELATIONAL_FAMILY = [
    "agg_groupby",
    "join_inner",
    "topk_per_group",
    "sort_limit",
]

FAMILY = [
    "ext_dedup_exact_text",
    "ext_dedup_minhash",
    "ext_dedup_simhash",
    "ext_dedup_embedding_lsh",
    "ext_sim_search_lsh",
    "ext_sim_search_ivf",
    "ext_sim_search_pq",
    "ext_fingerprint",
    "ext_token_count",
    "ext_quality_score",
    # round-3 additions with declared scale shapes
    "ext_tfidf",
    "ext_kmeans_spherical",
    "ext_semdedup",
    # curation additions: bitmap probe, canonicalize+group, line frequency
    "ext_bloom_decontaminate",
    "ext_url_dedup",
    "ext_dedup_lines",
]


def build_fixture(spark) -> None:
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    reps = [
        docs.select(
            (F.col("doc_id") + k * SHIFT).alias("doc_id"),
            (F.concat(F.lit(f"replica{k} variant "), "text") if k else F.col("text")).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for k in range(REPLICAS)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    out.repartition(32).write.mode("overwrite").parquet(f"{DST}/documents.parquet")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    ereps = []
    for k in range(REPLICAS):
        # circular shift by k keeps the norm, decorrelates replicas
        shifted = F.concat(
            F.slice("embedding", k + 1, dim - k), F.slice("embedding", 1, k)
        ) if k else F.col("embedding")
        cols = [c for c in emb.columns if c not in ("vec_id", "embedding")]
        ereps.append(
            emb.select(
                (F.col("vec_id") + k * SHIFT).alias("vec_id"),
                shifted.alias("embedding"),
                *cols,
            )
        )
    eout = ereps[0]
    for r in ereps[1:]:
        eout = eout.unionByName(r)
    eout.repartition(32).write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")

    # events: replicas get fresh keys (user_id shift) and fresh offsets
    # (event_id shift) with the SAME time distribution — key count scales
    # 10x, per-key window depth stays constant (the realistic growth mode)
    from flink_cdc_connectors_spark.sources.loaders import load_table

    ev = load_table(spark, SRC, "events")  # normalizes the NANOS-ts variant
    mx = ev.agg(F.max("event_id"), F.max("user_id")).first()
    emax, umax = mx[0] + 1, mx[1] + 1
    vreps = []
    for k in range(REPLICAS):
        vreps.append(
            ev.select(
                (F.col("event_id") + k * emax).alias("event_id"),
                "ts",
                (F.col("user_id") + k * umax).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    vout = vreps[0]
    for r in vreps[1:]:
        vout = vout.unionByName(r)
    vout.repartition(32).write.mode("overwrite").parquet(f"{DST}/events.parquet")
    # dims used by the events family, copied verbatim (dimension tables do
    # not scale with the fact side)
    spark.read.parquet(f"{SRC}/customer.parquet").write.mode("overwrite").parquet(
        f"{DST}/customer.parquet"
    )

    # relational facts: fresh order keys per replica (orderkeys shifted in
    # LOCKSTEP across lineitem and orders so the FK relationship holds);
    # o_custkey is NOT shifted — the customer dim stays fixed and each
    # customer simply has 10x the orders, the realistic fact-growth mode
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    okey_span = orders.agg(F.max("o_orderkey")).first()[0] + 1
    oreps = [
        orders.select(
            (F.col("o_orderkey") + k * okey_span).alias("o_orderkey"),
            *[c for c in orders.columns if c != "o_orderkey"],
        )
        for k in range(REPLICAS)
    ]
    oout = oreps[0]
    for r in oreps[1:]:
        oout = oout.unionByName(r)
    oout.repartition(32).write.mode("overwrite").parquet(f"{DST}/orders.parquet")

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    lreps = [
        li.select(
            (F.col("l_orderkey") + k * okey_span).alias("l_orderkey"),
            *[c for c in li.columns if c != "l_orderkey"],
        )
        for k in range(REPLICAS)
    ]
    lout = lreps[0]
    for r in lreps[1:]:
        lout = lout.unionByName(r)
    lout.repartition(32).write.mode("overwrite").parquet(f"{DST}/lineitem.parquet")


def time_query(spark, builder, sf_dir: str) -> float:
    t0 = time.monotonic()
    builder(spark, sf_dir).write.mode("overwrite").format("noop").save()
    elapsed = time.monotonic() - t0
    # same per-query isolation as bench.py: queries cache their own
    # intermediates, and accumulated caches would skew the 10x ratios the
    # probe exists to measure (differently at the two scales); the JVM GC
    # stops a heavy predecessor's garbage from being collected inside the
    # successor's timed window (observed 12x on ext_semdedup at sf1)
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    return elapsed


CORPUS_DST = os.environ.get("SPARK_GRAFT_CORPUS100_DIR", "/tmp/spark_graft_corpus100")

# Text-dedup + vector keys for the two-decade ladder. All read ONLY
# documents/embeddings; all have bounded-bucket candidate generators the
# 100x probe exists to stress. ext_dedup_incremental is deliberately
# absent: its contract fixes the corpus+batch at 200 base docs (the
# O(batch)-per-increment shape), so a corpus-size ladder measures only
# its fixed cost. ext_dedup_ngram_jaccard is absent for the same reason
# (its exact all-pairs contract caps the corpus at 200 docs; measured
# flat 1.1x/1.2x across both decades, i.e. pure fixed cost).
CORPUS_LADDER = [
    "ext_dedup_exact_text",
    "ext_dedup_minhash",
    "ext_dedup_simhash",
    "ext_dedup_lines",
    "ext_dedup_substring",
    "ext_url_dedup",
    "ext_dedup_embedding_lsh",
    "ext_sim_search_ivf",
    "ext_sim_search_pq",
    # round-5: the chained curation funnel (broadcast eval-set join)
    "ext_curation_pipeline",
]


def _widened_doc_replica(docs, k: int, shift: int):
    """Replica k of the documents table with a WIDENED vocabulary.

    The sf1 fixture's 'replica prefix' transform leaves replicas
    near-identical in shingle space (a 2-word prefix on a ~30-word doc
    keeps Jaccard ~0.85), so every replica of a doc near-dups every other
    — candidate pairs then grow quadratically with the replica count and
    the probe measures fixture saturation, not the engine (BASELINE.md r4
    note). Here every SECOND word gets a replica-specific suffix: every
    3-gram shingle contains at least one marked word, so cross-replica
    Jaccard ~= 0 and each decade adds distinct corpus mass with the SAME
    within-replica dup structure — constant dup density per decade, the
    property a scale ladder needs."""
    words = F.split(F.col("text"), r"\s+")
    marked = F.array_join(
        F.transform(
            words,
            lambda w, i: F.when(
                i % 2 == 0, F.concat(w, F.lit(f"_r{k}"))
            ).otherwise(w),
        ),
        " ",
    )
    return docs.select(
        (F.col("doc_id") + k * shift).alias("doc_id"),
        (marked if k else F.col("text")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )


def _emb_replica(emb, k: int, shift: int, dim: int):
    """Replica k of embeddings: circular shift by k % dim, negated for
    k >= dim (unit norm preserved, cosine decorrelated) — 2*dim distinct
    transforms, enough for 100 replicas of a 64-dim fixture."""
    r = k % dim
    shifted = (
        F.concat(F.slice("embedding", r + 1, dim - r), F.slice("embedding", 1, r))
        if r
        else F.col("embedding")
    )
    if k >= dim:
        shifted = F.transform(shifted, lambda x: -x)
    cols = [c for c in emb.columns if c not in ("vec_id", "embedding")]
    return emb.select(
        (F.col("vec_id") + k * shift).alias("vec_id"), shifted.alias("embedding"), *cols
    )


def build_corpus_ladder(spark) -> None:
    """sf1 = 10 widened replicas (id shift 100k), sf10 = 100 (shift 10k:
    max id 99*10_000+4999 < the 1M planted-copy offset — no key change
    needed). Both decades use the SAME transform so the ladder compares
    pure scale, not two fixture recipes."""
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    for name, n_rep, shift in (("sf1", 10, 100_000), ("sf10", 100, 10_000)):
        out = _widened_doc_replica(docs, 0, shift)
        for k in range(1, n_rep):
            out = out.unionByName(_widened_doc_replica(docs, k, shift))
        out.repartition(32).write.mode("overwrite").parquet(
            f"{CORPUS_DST}/{name}/documents.parquet"
        )
        eout = _emb_replica(emb, 0, shift, dim)
        for k in range(1, n_rep):
            eout = eout.unionByName(_emb_replica(emb, k, shift, dim))
        eout.repartition(32).write.mode("overwrite").parquet(
            f"{CORPUS_DST}/{name}/embeddings.parquet"
        )


def corpus_ladder_main() -> None:
    spark = get_spark(app_name="scale_probe_corpus")
    if "--rebuild" in sys.argv or not os.path.isdir(
        f"{CORPUS_DST}/sf10/embeddings.parquet"
    ):
        build_corpus_ladder(spark)
    queries = all_queries()
    results = {}
    keys = CORPUS_LADDER
    for i, a in enumerate(sys.argv):
        if a == "--keys":  # chunked runs: --keys k1,k2
            keys = sys.argv[i + 1].split(",")
    for key in keys:
        b = queries[key].builder
        time_query(spark, b, SRC)  # warm the plan family / JIT
        t01 = time_query(spark, b, SRC)
        t1 = time_query(spark, b, f"{CORPUS_DST}/sf1")
        t10 = time_query(spark, b, f"{CORPUS_DST}/sf10")
        results[key] = {
            "sf01": round(t01, 2),
            "sf1": round(t1, 2),
            "sf10": round(t10, 2),
            "r10": round(t1 / t01, 1) if t01 > 0 else None,
            "r100": round(t10 / t01, 1) if t01 > 0 else None,
        }
        print(
            f"| `{key}` | {t01:.2f} | {t1:.2f} | {t10:.2f} | "
            f"{t1 / t01:.1f}x | {t10 / t01:.1f}x |",
            file=sys.stderr,
        )
    print(json.dumps(results))


def main() -> None:
    if "--corpus-ladder" in sys.argv:
        corpus_ladder_main()
        return
    spark = get_spark(app_name="scale_probe")
    # lineitem.parquet is the NEWEST fixture artifact — a cache built by a
    # pre-relational probe has events but not the facts, and must rebuild
    if "--rebuild" in sys.argv or not os.path.isdir(f"{DST}/lineitem.parquet"):
        build_fixture(spark)
    queries = all_queries()
    results = {}
    keys = FAMILY + EVENTS_FAMILY + RELATIONAL_FAMILY
    for i, a in enumerate(sys.argv):
        if a == "--keys":  # chunked runs: --keys k1,k2
            keys = sys.argv[i + 1].split(",")
    for key in keys:
        b = queries[key].builder
        time_query(spark, b, SRC)  # warm the plan family / JIT
        t01 = time_query(spark, b, SRC)
        t1 = time_query(spark, b, DST)
        results[key] = {
            "sf01": round(t01, 2),
            "sf1": round(t1, 2),
            "ratio": round(t1 / t01, 1) if t01 > 0 else None,
        }
        print(f"| `{key}` | {t01:.2f} | {t1:.2f} | {t1 / t01:.1f}x |", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
