"""Tier C extensions, round 4: corpus statistics and clustering.

TF-IDF term weighting (the retrieval/quality-signal workhorse) and
spherical k-means (the clustering stage of SemDeDup-style semantic
pipelines), both with full DuckDB value oracles — the k-means oracle
replays BOTH Lloyd iterations unrolled in SQL, so even the iterative
refinement is hash-checked, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from flink_cdc_connectors_spark.registry import query
from flink_cdc_connectors_spark.sources.loaders import fan_out, load_table

# single source of truth for text normalization (tier_c defines the SQL
# form every oracle uses; functions/text.py the Column form)
from flink_cdc_connectors_spark.queries.tier_c import _NORM_SQL


@query(
    "ext_tfidf",
    tier="C",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split({_NORM_SQL.format(c="text")}, ' ')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM toks GROUP BY 1, 2),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 4) AS tfidf
      FROM tf JOIN df USING (term), n)
    SELECT doc_id, term, tf, tfidf, CAST(rn AS INT) AS rn
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, term) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
)
def ext_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — the classic distinctive-term
    signal (retrieval ranking, topic labeling, boilerplate detection in
    pretraining pipelines). tf from one (doc, term) aggregate, document
    frequency from a term-level aggregate, idf = ln(N/df), top terms by a
    per-doc window rank.

    Scale: two shuffles keyed on bounded-cardinality terms plus one on
    (doc, term); the df table is vocabulary-sized (<< corpus) and
    broadcast by AQE into the join. No per-row Python; ln/round are
    codegen'd. Scores round to 4 decimals on both engines so idf fp noise
    cannot flip the rank tiebreak (term asc breaks exact ties)."""
    from flink_cdc_connectors_spark.functions import text as T

    docs = load_table(spark, sf_dir, "documents")
    toks = fan_out(docs).select(
        "doc_id", F.explode(T.words("text")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()
    scored = tf.join(df, "term").select(
        "doc_id",
        "term",
        "tf",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 4).alias(
            "tfidf"
        ),
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "tfidf", "rn")
    )


def _duck_kmeans_oracle() -> str:
    from flink_cdc_connectors_spark.functions.vectors import duck_ivf_cell_sql

    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    a1 AS (SELECT vec_id, e, {duck_ivf_cell_sql('e')} AS cell FROM v),
    m1 AS (
      SELECT cell, i, avg(x) AS m FROM (
        SELECT cell, unnest(e) AS x, unnest(range(1, 65)) AS i FROM a1)
      GROUP BY 1, 2),
    c1 AS (SELECT cell, list(m ORDER BY i) AS c FROM m1 GROUP BY cell),
    sc AS (
      SELECT a.vec_id, a.e, c1.cell, list_dot_product(a.e, c1.c) AS s
      FROM a1 a CROSS JOIN c1),
    a2 AS (
      SELECT vec_id, e, cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY s DESC, cell) AS rn FROM sc)
      WHERE rn = 1),
    m2 AS (
      SELECT cell, i, avg(x) AS m FROM (
        SELECT cell, unnest(e) AS x, unnest(range(1, 65)) AS i FROM a2)
      GROUP BY 1, 2),
    norms AS (SELECT cell, round(sqrt(sum(m * m)), 4) AS centroid_norm_r
              FROM m2 GROUP BY cell),
    cnt AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_members
            FROM a2 GROUP BY cell)
    SELECT cell, n_members, centroid_norm_r FROM cnt JOIN norms USING (cell)
    """


@query("ext_kmeans_spherical", tier="C", oracle=_duck_kmeans_oracle())
def ext_kmeans_spherical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical k-means over the embeddings table, two Lloyd iterations —
    the clustering stage of SemDeDup-style semantic curation (cluster,
    then dedup/select within clusters). Init assigns each vector to the
    max-dot literal pseudo-centroid (the same deterministic family as the
    IVF index — no RNG, no trained state); the refined centroids are the
    per-cell component MEANS (a plain 64-column aggregate, map-side
    combinable); the second assignment ranks vectors against the 16
    data-valued centroids via a broadcast join. Output: final cell sizes
    and centroid norms.

    HASH-CHECKED: the oracle unrolls BOTH iterations in SQL from the same
    literal init — assignment, mean-centroid recomputation, re-assignment
    — so the driver's value hash covers the iterative refinement itself
    (ties in the re-assignment rank break by cell id; dots on identical
    inputs agree across engines far beyond the 4-decimal rounding).

    Scale: each iteration is one hash shuffle on cell id (the aggregate)
    plus a broadcast of k centroids — the textbook distributed Lloyd
    step; iterations are a Python loop over lazy frames, k rows collect
    per round (here unrolled to the fixed two the oracle replays)."""
    from flink_cdc_connectors_spark.functions import vectors as V

    emb = load_table(spark, sf_dir, "embeddings")
    base = fan_out(emb.select("vec_id", V.as_double("embedding").alias("e")))
    dim = 64

    a1 = base.select("vec_id", "e", V.ivf_centroid_id("e").alias("cell"))
    # refined centroid = per-cell mean vector, as 64 scalar aggregates
    # (map-side partial combine; an array-valued avg would shuffle arrays).
    # Round 13: the 64 avg aggregates build as ONE expr parse (array of
    # scalar avgs — the HashAggregate still computes 64 independent avg
    # buffers with partial combine, the array wraps them only in the
    # result projection); the old per-component Column loop cost ~800
    # gateway round trips per build, profiled as half this key's builder.
    mean_arr = (
        "array(" + ",".join(f"avg(element_at(e, {i + 1}))" for i in range(dim)) + ")"
    )
    c1 = a1.groupBy("cell").agg(F.expr(mean_arr).alias("c"))
    sc = a1.crossJoin(F.broadcast(c1.select(F.col("cell").alias("c_cell"), "c"))).select(
        "vec_id",
        "e",
        F.col("c_cell").alias("cell"),
        V.dot("e", "c").alias("s"),
    )
    a2 = sc.selectExpr(
        "*",
        "row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell ASC) AS rn",
    ).filter("rn = 1")
    final = a2.groupBy("cell").agg(
        F.expr("count(1)").alias("n_members"), F.expr(mean_arr).alias("m")
    )
    # same left-to-right summation order as the unrolled m0*m0 + m1*m1 + ...
    norm = "sqrt(" + " + ".join(
        f"element_at(m, {i + 1}) * element_at(m, {i + 1})" for i in range(dim)
    ) + ")"
    return final.selectExpr(
        "cell", "n_members", f"round({norm}, 4) AS centroid_norm_r"
    )


def _duck_semdedup_oracle() -> str:
    from flink_cdc_connectors_spark.functions.vectors import duck_ivf_cell_sql

    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    corpus AS (SELECT vec_id, e FROM v
               UNION ALL SELECT vec_id + 1000000, e FROM v),
    cells AS (SELECT vec_id, e, {duck_ivf_cell_sql('e')} AS cell FROM corpus),
    pairs AS (
      SELECT a.vec_id AS keep_id, b.vec_id AS drop_id
      FROM cells a JOIN cells b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE round(list_dot_product(a.e, b.e)
                  / (sqrt(list_dot_product(a.e, a.e))
                     * sqrt(list_dot_product(b.e, b.e))), 6) >= 0.95),
    dropped AS (SELECT DISTINCT drop_id FROM pairs)
    SELECT c.cell,
           CAST(count(*) AS BIGINT)                          AS n_vectors,
           CAST(count(*) FILTER (d.drop_id IS NOT NULL) AS BIGINT) AS n_dropped
    FROM cells c LEFT JOIN dropped d ON d.drop_id = c.vec_id
    GROUP BY c.cell
    """


# oracle_max_embeddings (VERDICT r11 #4): the cell count k widens past
# n_corpus = 2*count(embeddings) = 48_000 and the static 16-cell oracle
# stops applying — previously only a runtime warning; now machine-readable
@query(
    "ext_semdedup",
    tier="C",
    oracle=_duck_semdedup_oracle(),
    oracle_max_embeddings=24_000,
)
def ext_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al., 2023, arXiv:2303.09540): semantic
    deduplication by CLUSTER-then-dedup — vectors are clustered (here the
    deterministic literal centroid family; production would use the
    k-means of ``ext_kmeans_spherical``), and near-duplicate pairs are
    searched ONLY within a cluster, keeping the lowest id of each
    cos >= 0.95 pair. The cluster restriction is what makes semantic
    dedup tractable at corpus scale: the only wide operation is the
    shuffle on cluster id, never an all-pairs sweep; the planted exact
    copies (vec_id + offset) land in identical cells by construction, so
    every copy is dropped. Output: per-cell vector and dropped counts.

    TWO SCALE LEVERS, both found by the 10x probe (first measurement:
    74x runtime at 10x rows):
    - cluster count tracks the corpus (k doubles per corpus doubling
      past 48k rows, pinned to 16 at oracle scales so the static DuckDB
      replay stays valid where the driver compares) — with fixed k,
      within-cell pair counts grow quadratically;
    - the within-cell compare runs as ONE numpy GEMM per cell
      (``applyInPandas`` — cells are already groups), not a pair join
      with per-pair array folds: this is exactly how production SemDeDup
      scores clusters (a matmul per cluster), and the per-cell row also
      collapses the output without a second shuffle. Together: 164 s ->
      ~4 s at the sf1 probe."""
    import math

    import numpy as np
    import pandas as pd

    from flink_cdc_connectors_spark.functions import vectors as V

    emb = load_table(spark, sf_dir, "embeddings")
    n_corpus = 2 * emb.count()
    k = 16 * (1 << max(0, math.ceil(math.log2(max(n_corpus, 1) / 48_000))))
    if k != 16:
        # SCALE MODE: the static oracle replays exactly 16 cells (valid at
        # every driver fixture); beyond the pin the comparison must not run
        import warnings

        warnings.warn(
            f"ext_semdedup scale mode: {k} cells for {n_corpus} corpus "
            "rows — the 16-cell static oracle does not apply at this scale",
            stacklevel=2,
        )
    base_v = emb.select("vec_id", V.as_double("embedding").alias("e"))
    corpus = fan_out(
        base_v.unionByName(
            base_v.select((F.col("vec_id") + 1_000_000).alias("vec_id"), "e")
        )
    )
    if k == 16:
        # oracle scales: the SQL-expression assignment the static DuckDB
        # replay mirrors exactly (left-to-right dot sums, first-max index)
        cells = corpus.select(
            "vec_id", "e", V.ivf_centroid_id("e", num_centroids=k).alias("cell")
        )
    else:
        # SCALE MODE assignment: ivf_centroid_id's per-centroid `dot` is a
        # higher-order-function lambda, which Spark evaluates INTERPRETED —
        # at 512 centroids x 64 dims x 1M vectors that is ~33e9 interpreted
        # expression steps (measured 35.5 s / 43x at the 100x corpus, with
        # the GEMMs a rounding error). One numpy matmul per Arrow batch
        # against the same deterministic codebook does the identical
        # argmax (first-max, like array_position) at memory bandwidth:
        # 35.5 -> ~4 s. Codebook closure is factory-local so the UDF
        # pickles by value for foreign-cwd drivers.
        import numpy as np

        from flink_cdc_connectors_spark.functions.vectors import _hash_coef

        codebook = np.array(
            [[_hash_coef(f"ivf{c}", i) for i in range(64)] for c in range(k)]
        )

        def _assign_factory(C: "np.ndarray"):
            def assign(batches):
                import numpy as _np

                for pdf in batches:
                    mat = _np.stack(pdf["e"].to_numpy())
                    scores = mat @ C[:, : mat.shape[1]].T
                    yield pdf.assign(cell=scores.argmax(axis=1).astype("int32"))

            return assign

        cells = corpus.mapInPandas(
            _assign_factory(codebook), "vec_id long, e array<double>, cell int"
        )

    _rhu6 = V.round_half_up6  # bound into the closure as a plain function

    def dedup_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.stack(pdf["e"].to_numpy()[order]).astype(np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        # HALF_UP to match the oracle's F.round semantics exactly
        # (vectors.round_half_up6, round 11 — the rounding-mode half of
        # GEMM-ROUNDING-NOTE is closed; accumulation order remains the
        # documented residual); fixture-pinned identical.
        sims = _rhu6(mat @ mat.T)
        # j dropped iff any i<j with cos >= 0.95 (ids ascending by sort)
        hit = np.triu(sims >= 0.95, k=1)
        dropped = int(hit.any(axis=0).sum())
        return pd.DataFrame(
            {
                "cell": [int(pdf["cell"].iloc[0])],
                "n_vectors": [len(ids)],
                "n_dropped": [dropped],
            }
        )

    return cells.groupBy("cell").applyInPandas(
        dedup_cell, "cell int, n_vectors long, n_dropped long"
    )
