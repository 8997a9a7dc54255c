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

from flink_cdc_connectors_spark.queries import tier_c as _TC
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
    # explode_outer, not explode: InferFiltersFromGenerate synthesizes a
    # size()/isnotnull predicate for plain explode and can push it BELOW
    # the projection, re-evaluating split(text) per predicate (the measured
    # 13x shingle regression this repo pins in _shingles /
    # ext_dedup_substring). Outer explode infers no filter; the sequence
    # always has >= 1 element here, so no null rows need dropping.
    staged = words.select(
        "doc_id",
        "w",
        F.explode_outer(F.sequence(F.lit(1), F.size("w"), F.lit(_STRIDE))).alias("s"),
    ).filter(F.col("s").isNotNull())
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


def _duck_sim_pq_oracle() -> str:
    from flink_cdc_connectors_spark.functions.vectors import (
        duck_ivf_cell_sql,
        duck_ivf_probe_structs_sql,
        duck_pq_adc_sql,
        duck_pq_codes_sql,
    )

    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    compact AS (SELECT vec_id, e, {duck_ivf_cell_sql('e')} AS cell,
                       {duck_pq_codes_sql('e')} AS codes FROM v),
    q AS (SELECT vec_id AS q_id, e AS qv FROM v WHERE vec_id % 100 = 0 AND vec_id < {_TC._QUERY_ID_CAP}),
    qscore AS (
      SELECT q_id, qv, x.s AS s, x.c AS cell
      FROM (SELECT q_id, qv, unnest({duck_ivf_probe_structs_sql('qv')}) AS x FROM q) t),
    qtop AS (
      SELECT q_id, qv, cell FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY s DESC, cell DESC) AS pr
        FROM qscore) WHERE pr <= 2),
    adc AS (
      SELECT qt.q_id, c.vec_id,
             round({duck_pq_adc_sql('qt.qv', 'c.codes')}, 6) AS adc
      FROM qtop qt JOIN compact c ON c.cell = qt.cell AND c.vec_id <> qt.q_id),
    short AS (
      SELECT q_id, vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, vec_id) AS arn
        FROM adc) WHERE arn <= 32),
    rerank AS (
      SELECT s.q_id, s.vec_id,
             round(list_dot_product(q.qv, c.e)
                   / (sqrt(list_dot_product(q.qv, q.qv))
                      * sqrt(list_dot_product(c.e, c.e))), 6) AS sim
      FROM short s JOIN v c ON c.vec_id = s.vec_id JOIN q ON q.q_id = s.q_id)
    SELECT q_id, vec_id, sim, CAST(rn AS INT) AS rn
    FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
          FROM rerank)
    WHERE rn <= 10
    """


# Corpus-size gate for the GEMM ADC path: below it the join + expression
# shortlist runs (the form the DuckDB oracle replays bit-identically —
# every driver fixture is <= 30k vectors); above it ADC scoring moves to
# one numpy lookup-table pass per IVF cell inside a cogrouped
# applyInPandas (the round-8 pattern that fixed the three sibling ANN
# keys). sf0.1 = 2k vectors, the sf10 ladder = 200k.
_PQ_GEMM_MIN_ROWS = 50_000

# Bound on corpus rows per GEMM group: IVF has a FIXED 16-cell family, so
# per-cell row count grows linearly with the corpus; past ~200k rows/cell
# the cell is salted into ceil(rows/cell / 200k) sub-groups and queries
# probe every salt — per-group top-32 stays a valid partial (a global
# top-32 member is in its group's top-32 under the same total order), and
# group memory stays bounded at 100 TB instead of one cell = one task.
_PQ_GEMM_GROUP_ROWS = 200_000


def _pq_compact_gemm(base: DataFrame) -> DataFrame:
    """SCALE-MODE encoder: (vec_id, cell, codes) via one numpy pass per
    Arrow batch (mapInPandas, map-only — no exchange). The Column form
    evaluates 16 centroid dots + 8x16 subspace dots per row through
    interpreted higher-order lambdas — profiled 9.5 s of the 200k-row sf10
    run, the dominant term after the ADC fix; here the batch encodes as
    17 small matmuls. Cell/code assignment is the FIRST argmax on both
    engines (``array_position(array_max)`` / ``np.argmax``) over the same
    literal-double codebooks, so outputs are identical (pinned by the
    forced-GEMM A/B in tests/test_plan_audits.py)."""
    from flink_cdc_connectors_spark.functions import vectors as V

    cents_ivf = V.ivf_centroids_np()  # (16, dim)
    cents_pq = V.pq_centroids_np()  # (m, k, sub_dim)
    half = 0.5 * (cents_pq**2).sum(axis=2)  # (m, k) plan-time half-norms

    def enc(batches):
        import numpy as np
        import pandas as pd

        m, _, sub = cents_pq.shape
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["v"].to_numpy()).astype(np.float64)  # (n, d)
            d = mat.shape[1]
            cell = np.argmax(mat @ cents_ivf[:, :d].T, axis=1).astype(np.int32)
            codes = np.empty((len(mat), m), dtype=np.int32)
            for s in range(m):
                scores = mat[:, s * sub : (s + 1) * sub] @ cents_pq[s].T - half[s]
                codes[:, s] = np.argmax(scores, axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cell": cell, "codes": list(codes)}
            )

    return base.mapInPandas(enc, "vec_id long, cell int, codes array<int>")


def _pq_adc_shortlist_gemm(corpus: DataFrame, probes: DataFrame, n_corpus: int) -> DataFrame:
    """SCALE-MODE ADC shortlist: (q_id, vec_id, adc) top-32 per query.

    ``corpus`` carries (vec_id, cell, codes) — codes only, never raw
    vectors; ``probes`` carries (q_id, qv, cell), one row per probed cell.
    The join form pays an interpreted 8-subspace slice/element_at/HOF-dot
    fold per candidate pair (the measured 6.2x / 15.57 s sf10 term —
    VERDICT r8); here each (cell[, salt]) group builds every query's
    m x k lookup table once (one einsum against the literal codebook) and
    scores ALL its candidates with one fancy-indexed gather — identical
    shuffle count (one exchange on the group key vs the join's broadcast),
    candidate pairs never materialize through an exchange. Rounding (6dp
    BEFORE ranking) and tie-breaks ((-adc, vec_id)) mirror the join form
    exactly; A/B pinned by tests/test_plan_audits.py (forced-GEMM vs join
    form, identical rows at sf0.001/sf0.1). Rounding mode MATCHES the join
    form since round 11 (vectors.round_half_up6 — Spark-HALF_UP-exact);
    the residual cross-gate term is GEMM accumulation ORDER only (see
    GEMM-ROUNDING-NOTE in tier_c.py)."""
    import math

    from flink_cdc_connectors_spark.functions import vectors as V

    n_salt = max(1, math.ceil(n_corpus / 16 / _PQ_GEMM_GROUP_ROWS))
    keys = ["cell"]
    if n_salt > 1:
        corpus = corpus.withColumn(
            "salt", F.pmod(F.col("vec_id"), F.lit(n_salt)).cast("int")
        )
        probes = probes.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
        )
        keys = ["cell", "salt"]

    cents = V.pq_centroids_np()  # (m, k, sub_dim), pickled into the closure
    m = cents.shape[0]
    _rhu6 = V.round_half_up6  # bound into the closure as a plain function

    def adc_topk(left, right):
        import numpy as np
        import pandas as pd

        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(
                {
                    "q_id": np.array([], dtype=np.int64),
                    "vec_id": np.array([], dtype=np.int64),
                    "adc": np.array([], dtype=np.float64),
                }
            )
        ids = left["vec_id"].to_numpy()
        codes = np.stack(left["codes"].to_numpy()).astype(np.int64)  # (n, m)
        sidx = np.arange(m)
        out = []
        for q_id, qv in zip(right["q_id"].to_numpy(), right["qv"].to_numpy()):
            qsub = np.asarray(qv, dtype=np.float64).reshape(m, -1)
            lut = np.einsum("sd,skd->sk", qsub, cents)  # (m, k)
            scores = _rhu6(lut[sidx, codes].sum(axis=1))
            mask = ids != q_id
            cids, cscores = ids[mask], scores[mask]
            sel = np.lexsort((cids, -cscores))[:32]
            out.append(
                pd.DataFrame(
                    {
                        "q_id": np.full(len(sel), q_id, dtype=np.int64),
                        "vec_id": cids[sel],
                        "adc": cscores[sel],
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    partial = (
        corpus.groupBy(*keys)
        .cogroup(probes.groupBy(*keys))
        .applyInPandas(adc_topk, "q_id long, vec_id long, adc double")
    )
    # final top-32 across a query's probed groups: <= 2 * n_salt * 32 rows
    # per q_id reach this window — a driver-thin sort, not the full
    # candidate set the join form ranks
    w_adc = W.partitionBy("q_id").orderBy(F.desc("adc"), F.asc("vec_id"))
    return partial.withColumn("arn", F.row_number().over(w_adc)).filter(
        F.col("arn") <= 32
    )


@query("ext_sim_search_pq", tier="C", oracle=_duck_sim_pq_oracle())
def ext_sim_search_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (hash-checked since round 3 — the IVF centroid and PQ
    codebook families are plan-time literals shared with the DuckDB oracle,
    which replays cell assignment, top-2 probing, PQ encoding, ADC scoring,
    the 32-candidate shortlist, and the exact re-rank; ADC scores are
    rounded to 6 decimals on BOTH sides so summation-order fp noise cannot
    flip the shortlist boundary): the FAISS-style two-level structure — IVF
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
    ``ext_ann_recall`` (method 'ivf_pq').

    ADC ENGINE GATE (round 9): below ``_PQ_GEMM_MIN_ROWS`` the shortlist
    is the broadcast join + per-candidate expression fold the oracle
    replays bit-identically; at scale the per-candidate interpreted
    slice/element_at fold was the measured 100x term (15.57 s / 6.2x at
    sf10 — VERDICT r8) and ADC scoring moves to ``_pq_adc_shortlist_gemm``
    — one numpy lookup-table pass per IVF cell, A/B-identical rows
    (pinned in tests/test_plan_audits.py, both salted and unsalted; an
    empirical fixture pin — residual half-even-vs-HALF_UP rounding
    caveat: GEMM-ROUNDING-NOTE in tier_c.py)."""
    from flink_cdc_connectors_spark.functions import vectors as V

    emb = load_table(spark, sf_dir, "embeddings")
    # bounded driver scalar: footer-only count gates the ADC engine
    n_corpus = emb.count()
    base = fan_out(emb.select("vec_id", V.as_double("embedding").alias("v")))
    # compact index representation: cell + codes, no raw vector; past the
    # gate the encode moves to numpy batches too (see _pq_compact_gemm —
    # the interpreted-HOF encode was the profiled sf10 dominant term)
    if n_corpus < _PQ_GEMM_MIN_ROWS:
        compact = base.select(
            "vec_id",
            V.ivf_centroid_id("v").alias("cell"),
            V.pq_codes("v").alias("codes"),
        )
    else:
        compact = _pq_compact_gemm(base)
    queries = base.filter(
        (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < _TC._QUERY_ID_CAP)
    ).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.explode(V.ivf_centroid_topk("v", probes=2)).alias("cell"),
    )
    if n_corpus < _PQ_GEMM_MIN_ROWS:
        # oracle scales: the broadcast join + expression ADC the DuckDB
        # SQL replays verbatim (bit-valid value hash)
        adc = (
            compact.join(F.broadcast(queries), "cell")
            .filter(F.col("vec_id") != F.col("q_id"))
            .select(
                "q_id",
                "vec_id",
                F.round(V.pq_adc_score("qv", "codes"), 6).alias("adc"),
            )
        )
        w_adc = W.partitionBy("q_id").orderBy(F.desc("adc"), F.asc("vec_id"))
        shortlist = adc.withColumn("arn", F.row_number().over(w_adc)).filter(
            F.col("arn") <= 32
        )
    else:
        # SCALE MODE: one numpy lookup-table pass per IVF cell (see
        # _pq_adc_shortlist_gemm) — same rounding/tie-breaks, A/B-pinned
        shortlist = _pq_adc_shortlist_gemm(compact, queries, n_corpus)
    # exact re-rank touches only the shortlist: join back to raw vectors
    qv = base.filter(
        (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < _TC._QUERY_ID_CAP)
    ).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    rerank = (
        shortlist.select("q_id", "vec_id")
        .join(base, "vec_id")
        .join(F.broadcast(qv), "q_id")
        .select(
            "q_id",
            "vec_id",
            F.round(V.cosine_sim("qv", "v"), 6).alias("sim"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return rerank.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 10)


# ---------------------------------------------------------------------------
# Unigram-LM perplexity proxy
# ---------------------------------------------------------------------------


@query(
    "ext_unigram_logprob",
    tier="C",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
      FROM documents),
    lm AS (
      SELECT tok, ln(CAST(count(*) AS DOUBLE)
                     / (SELECT count(*) FROM toks)) AS logp
      FROM toks GROUP BY tok),
    scored AS (
      SELECT t.doc_id,
             CAST(count(*) AS BIGINT) AS n_tok,
             sum(CAST(round(lm.logp, 8) AS DECIMAL(18,8))) AS lp_sum
      FROM toks t JOIN lm ON t.tok = lm.tok
      GROUP BY t.doc_id)
    SELECT doc_id, n_tok,
           CAST(round(lp_sum / n_tok, 4) AS DOUBLE) AS avg_logprob,
           CASE WHEN lp_sum / n_tok < -5.5 THEN 1 ELSE 0 END AS is_outlier
    FROM scored
    """,
)
def ext_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-PROXY quality scoring: train a unigram LM on the corpus
    itself (token -> ln relative frequency), score each document by mean
    token log-probability, flag low-likelihood outliers — the cheap stand-in
    for the KenLM/CCNet perplexity filter every pretraining pipeline runs.
    Two-pass plan: one shuffle builds the LM (vocabulary-sized — kilobytes
    even at 100 TB, so it BROADCASTS back), one shuffle re-aggregates
    per doc. Per-token logprobs are rounded then summed in DECIMAL so the
    cross-engine float-summation order can't flip the hash."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id", F.explode_outer(F.split(F.trim("text"), " ")).alias("tok")
    ).filter(F.col("tok").isNotNull())
    total = toks.count()  # driver scalar: corpus token count (one number)
    lm = toks.groupBy("tok").agg(
        F.log(F.count(F.lit(1)) / F.lit(float(total))).alias("logp")
    )
    scored = (
        toks.join(F.broadcast(lm), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum(F.round("logp", 8).cast("decimal(18,8)")).alias("lp_sum"),
        )
    )
    avg = F.col("lp_sum") / F.col("n_tok")
    return scored.select(
        "doc_id",
        "n_tok",
        F.round(avg, 4).cast("double").alias("avg_logprob"),
        F.when(avg < -5.5, F.lit(1)).otherwise(F.lit(0)).alias("is_outlier"),
    )


# ---------------------------------------------------------------------------
# Multimodal frame sampling
# ---------------------------------------------------------------------------


@query(
    "ext_multimodal_frames",
    tier="C",
    oracle="""
    WITH b AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
    f AS (
      SELECT doc_id, text,
             unnest(range(0, CAST(ceil(n / 256.0) AS BIGINT), 2)) AS frame_idx
      FROM b)
    SELECT doc_id,
           CAST(frame_idx AS INT)        AS frame_idx,
           CAST(frame_idx * 256 AS BIGINT) AS frame_off,
           md5(substring(text, CAST(frame_idx * 256 + 1 AS INT), 256)) AS frame_sig
    FROM f
    """,
)
def ext_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-SAMPLING plumbing: an opaque binary column decodes to
    MANY rows per payload — each Arrow batch row yields its stride-sampled
    frames (every 2nd 256-byte 'frame'), emitted as (doc_id, frame_idx,
    byte offset, frame signature). The 1->N batch-iterator shape is the
    production frame sampler's (ffmpeg body would replace the stub; absent
    in this container, the 'frame' is a deterministic byte slice and the
    'feature' its md5 — fully oracle-checkable since the fixture text is
    ASCII, so DuckDB's char slicing sees the same bytes). Zero shuffles:
    sampling is map-only and the downstream embedding fleet consumes the
    exploded frames directly."""
    import hashlib

    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))

    def sample_frames(batches):
        # STUB for the video decoder: 256-byte frames, stride-2 sampling.
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                total = -(-len(b) // 256)  # ceil
                for idx in range(0, total, 2):
                    rows.append(
                        (
                            doc_id,
                            idx,
                            idx * 256,
                            hashlib.md5(b[idx * 256 : (idx + 1) * 256]).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_off", "frame_sig"]
            )

    return fan_out(payloads).mapInPandas(
        sample_frames,
        schema="doc_id long, frame_idx int, frame_off long, frame_sig string",
    )


# ---------------------------------------------------------------------------
# Duplicated-substring span detection
# ---------------------------------------------------------------------------


@query(
    "ext_dedup_substring",
    tier="C",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    grams AS (
      SELECT doc_id, unnest(generate_series(1, len(w) - 7)) AS pos, w
      FROM words WHERE len(w) >= 8),
    hashed AS (
      SELECT doc_id, pos, md5(array_to_string(w[pos : pos + 7], ' ')) AS g
      FROM grams),
    dup AS (
      SELECT g FROM hashed GROUP BY g HAVING count(*) >= 2),
    hits AS (
      SELECT h.doc_id, h.pos,
             h.pos - row_number() OVER (PARTITION BY h.doc_id ORDER BY h.pos)
               AS island
      FROM hashed h JOIN dup USING (g))
    SELECT doc_id,
           CAST(min(pos) AS INT)      AS span_start,
           CAST(max(pos) + 8 AS INT)  AS span_end,
           CAST(count(*) AS BIGINT)   AS n_dup_grams
    FROM hits
    GROUP BY doc_id, island
    """,
)
def ext_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-SUBSTRING span detection — the suffix-array dedup
    of Lee et al., "Deduplicating Training Data Makes Language Models
    Better" (ACL 2022), re-expressed distributed: any 8-gram occurring >=2
    times anywhere in the corpus marks its positions, and runs of
    consecutive duplicated positions merge into cut-spans
    (doc_id, token start, token end) — the spans a dedup pass would excise
    rather than dropping whole documents. Plan: positions ride along the
    shingle explode (staged split, explode_outer — the single-evaluation
    pattern pinned by test_shingle_expression_evaluated_once); duplicated
    grams found by ONE hash aggregate on md5(gram) — the shuffle key is a
    16-byte hash, never the text; span merge is the islands-and-gaps
    window partitioned per doc (never global). At 100 TB this is the
    standard two-shuffle shape: gram-hash aggregate + per-doc window."""
    docs = load_table(spark, sf_dir, "documents")
    d = fan_out(docs)
    n = 8
    words = d.select("doc_id", F.split("text", " ").alias("w"))
    # when-guarded sequence, not a size() pre-filter: a filter on the
    # staged array would push below the repartition and re-inline the
    # split (the same InferFilters hazard _shingles documents); Spark's
    # sequence() DESCENDS for stop < start, so the guard is required.
    positions = F.when(
        F.size("w") >= n, F.sequence(F.lit(1), F.size("w") - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    staged = words.select(
        "doc_id", "w", F.explode_outer(positions).alias("pos")
    ).filter(F.col("pos").isNotNull())
    # The gram hash is purely an EQUALITY key (unlike MinHash banding it
    # samples nothing), so any injective-ish hash yields the same dup
    # sets and spans. Past the corpus gate, hash the word tuple directly
    # with xxhash64 — no slice + array_join string assembly, no md5, and
    # an 8-byte shuffle key instead of a 32-char hex string (the same
    # string-assembly lever that flattened ext_dedup_minhash; output
    # changes only on a 64-bit collision, P ~ 1e-9 at the 100x corpus).
    # At driver-fixture scales the md5 form is pinned — the DuckDB oracle
    # replays it verbatim.
    if docs.count() <= _TC._MINHASH_SCALE_DOCS:
        gram = F.md5(F.array_join(F.slice(F.col("w"), F.col("pos"), n), " "))
    else:
        gram = F.xxhash64(
            *[F.element_at(F.col("w"), F.col("pos") + i) for i in range(n)]
        )
    hashed = staged.select("doc_id", "pos", gram.alias("g"))
    dup = hashed.groupBy("g").agg(F.count(F.lit(1)).alias("c")).filter(
        F.col("c") >= 2
    ).select("g")
    hits = hashed.join(dup, "g")
    w_pos = W.partitionBy("doc_id").orderBy("pos")
    islands = hits.withColumn(
        "island", F.col("pos") - F.row_number().over(w_pos)
    )
    return islands.groupBy("doc_id", "island").agg(
        F.min("pos").cast("int").alias("span_start"),
        (F.max("pos") + n).cast("int").alias("span_end"),
        F.count(F.lit(1)).alias("n_dup_grams"),
    ).drop("island")


# ---------------------------------------------------------------------------
# Quality-filter ensemble (the final keep/drop decision)
# ---------------------------------------------------------------------------

# Compose the three signal oracles verbatim (one source of truth — the same
# registry-nesting pattern ext_dedup_cluster uses for its edge list).
# The owning modules must import FIRST: reading another module's
# registration at import time otherwise depends on who imported US (a
# test importing this module directly, before anything called
# registry.all_queries(), hit a KeyError here).
import flink_cdc_connectors_spark.queries.tier_c  # noqa: E402,F401
import flink_cdc_connectors_spark.queries.tier_c_ext  # noqa: E402,F401
from flink_cdc_connectors_spark.registry import _REGISTRY as _REG  # noqa: E402


@query(
    "ext_filter_ensemble",
    tier="C",
    oracle=f"""
    WITH q AS ({{q}}),
    r AS ({{r}}),
    l AS ({{l}})
    SELECT q.doc_id,
           CASE WHEN q.quality >= 0.5 THEN 1 ELSE 0 END       AS q_pass,
           CASE WHEN r.is_repetitive = 0 THEN 1 ELSE 0 END    AS rep_pass,
           CASE WHEN l.is_outlier = 0 THEN 1 ELSE 0 END       AS lp_pass,
           CASE WHEN q.quality >= 0.5 AND r.is_repetitive = 0
                     AND l.is_outlier = 0 THEN 1 ELSE 0 END   AS keep
    FROM q JOIN r ON q.doc_id = r.doc_id JOIN l ON q.doc_id = l.doc_id
    """.format(
        q=_REG["ext_quality_score"].oracle,
        r=_REG["ext_repetition_ratio"].oracle,
        l=_REG["ext_unigram_logprob"].oracle,
    ),
)
def ext_filter_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FINAL keep/drop decision of a pretraining filter pipeline:
    ensemble the three independent quality signals — heuristic quality
    score >= 0.5 (C4/Gopher rules), duplicate-bigram repetition <= 0.2,
    unigram-LM log-likelihood above the outlier floor — into per-doc pass
    flags and one keep bit, the audit record a data curator reviews before
    dropping documents. Each signal is the REGISTERED operator's own
    computation (builders composed Spark-side, oracles composed verbatim
    SQL-side — one source of truth per signal); the three doc-keyed joins
    are broadcast-sized per grouping and 1:1, so the plan stays three hash
    joins on doc_id with no amplification. Every threshold compares the
    ROUNDED value both engines already agree on hash-exactly."""
    from flink_cdc_connectors_spark.queries.tier_c import ext_quality_score
    from flink_cdc_connectors_spark.queries.tier_c_ext import ext_repetition_ratio

    q = ext_quality_score(spark, sf_dir)
    r = ext_repetition_ratio(spark, sf_dir).select("doc_id", "is_repetitive")
    lp = ext_unigram_logprob(spark, sf_dir).select("doc_id", "is_outlier")
    j = q.join(r, "doc_id").join(lp, "doc_id")
    q_pass = F.when(F.col("quality") >= 0.5, 1).otherwise(0)
    rep_pass = F.when(F.col("is_repetitive") == 0, 1).otherwise(0)
    lp_pass = F.when(F.col("is_outlier") == 0, 1).otherwise(0)
    return j.select(
        "doc_id",
        q_pass.alias("q_pass"),
        rep_pass.alias("rep_pass"),
        lp_pass.alias("lp_pass"),
        (q_pass * rep_pass * lp_pass).alias("keep"),
    )
