"""Tier C extensions, third batch: RAG-style document chunking and
product-quantization ANN (IVF-PQ) — the remaining stages of a
retrieval/training pipeline over the `documents`/`embeddings` fixtures.

Same design rules as tier_c/tier_c_ext: pure JVM Column expressions in the
row path, deterministic plan-time constants instead of RNG, an exact DuckDB
oracle wherever the computation is SQL-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from flink_cdc_connectors_spark.registry import query
from flink_cdc_connectors_spark.sources.loaders import fan_out, load_table

# ---------------------------------------------------------------------------
# RAG chunking
# ---------------------------------------------------------------------------

_CHUNK = 64  # tokens per chunk
_STRIDE = 48  # stride between chunk starts (16-token overlap)


@query(
    "ext_doc_chunk",
    tier="C",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    starts AS (
      SELECT doc_id, w, unnest(generate_series(1, len(w), {_STRIDE})) AS s
      FROM words)
    SELECT doc_id,
           CAST((s - 1) // {_STRIDE} AS INT)              AS chunk_id,
           CAST(s AS INT)                                 AS chunk_start,
           CAST(least({_CHUNK}, len(w) - s + 1) AS INT)   AS n_tok,
           md5(array_to_string(w[s : s + {_CHUNK} - 1], ' ')) AS chunk_md5
    FROM starts
    """,
)
def ext_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG document chunking: overlapping token windows (64 tokens, stride
    48 -> 16-token overlap), the standard retrieval-index preprocessing
    step. One narrow plan: split once, generate the start offsets with
    ``sequence`` (arithmetic — no per-token work), explode, and slice the
    STAGED word array per chunk. Zero shuffles, zero UDFs; at 100 TB this
    is a map-only stage whose output feeds the embedding fleet. Emitting
    md5(chunk) keeps the compared surface value-complete (the exact chunk
    text) while rows stay narrow."""
    d = load_table(spark, sf_dir, "documents")
    # Stage the split once (same CollapseProject reasoning as
    # ext_repetition_ratio): referencing split() inside per-chunk slices
    # would re-split the doc for every chunk.
    words = d.select("doc_id", F.split("text", " ").alias("w"))
    staged = words.select(
        "doc_id", "w", F.explode(F.sequence(F.lit(1), F.size("w"), F.lit(_STRIDE))).alias("s")
    )
    return staged.select(
        "doc_id",
        ((F.col("s") - 1) / _STRIDE).cast("int").alias("chunk_id"),
        F.col("s").cast("int").alias("chunk_start"),
        F.least(F.lit(_CHUNK), F.size("w") - F.col("s") + 1).cast("int").alias("n_tok"),
        F.md5(F.array_join(F.slice(F.col("w"), F.col("s"), _CHUNK), " ")).alias(
            "chunk_md5"
        ),
    )


# ---------------------------------------------------------------------------
# IVF-PQ approximate nearest neighbors
# ---------------------------------------------------------------------------


@query("ext_sim_search_pq", tier="C", oracle=None)
def ext_sim_search_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (rows-only): the FAISS-style two-level structure — IVF
    coarse cells prune WHICH vectors a query touches, product-quantization
    codes compress WHAT is scored. Corpus side: one pass computes the cell
    id and the 8 PQ codes (functions/vectors.py::pq_codes — argmin-L2
    against deterministic per-subspace codebooks), after which the raw
    vectors are no longer shipped: the candidate join carries
    (vec_id, cell, 8 codes) — a ~64x shuffle-payload cut versus the
    64-double embedding, which is the whole point at 100 TB. Query side
    probes its top-2 cells, ADC-scores candidates from codes alone
    (pq_adc_score: m table lookups per pair), keeps the top-32 ADC
    candidates, and ONLY those rejoin the raw vectors for the exact cosine
    re-rank to top-10. Recall of this operating point is measured in
    ``ext_ann_recall`` (method 'ivf_pq')."""
    from flink_cdc_connectors_spark.functions import vectors as V

    emb = load_table(spark, sf_dir, "embeddings")
    base = fan_out(emb.select("vec_id", V.as_double(F.col("embedding")).alias("v")))
    # compact index representation: cell + codes, no raw vector
    compact = base.select(
        "vec_id",
        V.ivf_centroid_id(F.col("v")).alias("cell"),
        V.pq_codes(F.col("v")).alias("codes"),
    )
    queries = base.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.explode(V.ivf_centroid_topk(F.col("v"), probes=2)).alias("cell"),
    )
    adc = (
        compact.join(F.broadcast(queries), "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            V.pq_adc_score(F.col("qv"), F.col("codes")).alias("adc"),
        )
    )
    w_adc = W.partitionBy("q_id").orderBy(F.desc("adc"), F.asc("vec_id"))
    shortlist = adc.withColumn("arn", F.row_number().over(w_adc)).filter(
        F.col("arn") <= 32
    )
    # exact re-rank touches only the shortlist: join back to raw vectors
    qv = base.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    rerank = (
        shortlist.select("q_id", "vec_id")
        .join(base, "vec_id")
        .join(F.broadcast(qv), "q_id")
        .select(
            "q_id",
            "vec_id",
            F.round(V.cosine_sim(F.col("qv"), F.col("v")), 6).alias("sim"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return rerank.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 10)
