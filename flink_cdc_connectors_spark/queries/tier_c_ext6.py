"""Tier C capstone: the complete pre-training curation funnel in ONE
declarative plan.

Every Tier-C stage exists as its own driver-checked key — language ID
(``ext_lang_id``), quality scoring (``ext_quality_score``), exact dedup
(``ext_dedup_exact_text``), n-gram decontamination
(``ext_decontaminate``), token-budget domain mixing (``ext_domain_mix``).
Production pipelines run them CHAINED: each stage's survivor set feeds
the next, and the numbers that matter are the per-stage funnel counts
(what did language filtering cost us, how much did dedup remove, what
survived to the mixer). ``ext_curation_pipeline`` composes the exact
same signals (imported from their home keys — one source of truth) into
a single DataFrame plan and emits the per-language funnel audit:

    ingest -> lang-ID filter -> quality filter -> exact dedup (keeper =
    first surviving doc per normalized-text hash) -> eval-set 8-gram
    decontamination -> token-budget mix sampling

The corpus is documents ∪ planted perturbed copies minus the held-out
eval slice (doc_id % 50 == 0 originals), so every stage is non-vacuous
by construction: copies collapse at the dedup stage, the copies OF eval
docs survive dedup (their originals are held out) and must be caught by
decontamination, and the per-language token budget forces sub-1 sampling
rates for the large languages. Stage thresholds are plan literals shared
with the DuckDB oracle; a wrong stage order, a dedup rank that ignores
the quality gate, or a mix rate computed off the wrong survivor set all
hash-mismatch.

Scale shape (100 TB): one shuffle per aggregation boundary — the
text-hash window for dedup, the 8-gram equi-join against a BROADCAST
eval shingle set (kilobytes: a benchmark suite), the per-language stage
aggregate (≤6 groups), and a broadcast join back for the mix coin. The
per-doc flag frame is cached before its two consumers (the stage
aggregate and the mix pass) so the shingle join never runs twice; the
mix coin is the same multiplicative-hash filter as
``ext_stratified_sample`` — no sort, no global window, reproducible
under repartitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from flink_cdc_connectors_spark.registry import query
from flink_cdc_connectors_spark.sources.loaders import fan_out, load_table
from flink_cdc_connectors_spark.queries.tier_c import (
    _EVAL_PRED_SQL,
    _NORM_SQL,
    _QUALITY_SQL,
    _SHINGLE8_SQL,
    _LANG_PRED_SQL,
    _WITH_COPIES_SQL,
    _norm_col,
    _shingles,
    _with_copies,
    lang_pred_col,
    quality_col,
)

_QUALITY_MIN = 0.58     # ~p10 of en-classified docs at every fixture SF (non-vacuous both ways)
_MIX_BUDGET_TOK = 2000  # per-language token budget (ext_domain_mix's knob)
_MIX_HASH = 2654435761  # Knuth multiplicative coin (ext_stratified_sample)


def _shingle_hashes(docs: DataFrame, n: int = 8) -> DataFrame:
    """(doc_id, g) pairs — xxhash64 of each word n-tuple of normalized
    text, the scale twin of ``_shingles``: the contamination check is a
    pure EQUALITY membership test (like the substring gram key, it
    samples nothing), so any injective-ish hash yields the same contam
    set. Skipping the slice + array_join string assembly was measured as
    the key's dominant 100x cost (18.7 s of the 28.7 s total at the
    corpus sf10 — the same string-assembly lever that flattened
    ext_dedup_minhash and ext_dedup_substring); the join key becomes 8
    bytes instead of a ~50-char string. Output changes only on a 64-bit
    collision (P ~ 1e-9 at the 100x corpus).

    Pairs are deduplicated PER DOC map-side (``array_distinct`` over the
    per-doc gram array, the same shape ``_shingles`` uses) before the
    explode: a document repeating a contaminated 8-gram must not fan out
    the broadcast-join output proportionally on the scale path — the
    downstream ``.distinct()`` on doc_id keeps the contam set identical
    either way, but only after paying the fan-out."""
    from flink_cdc_connectors_spark.queries.tier_c import _norm_col

    words = docs.select(
        "doc_id", F.split(_norm_col(F.col("text")), r"\s+").alias("w")
    )
    positions = F.when(
        F.size("w") >= n, F.sequence(F.lit(1), F.size("w") - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.array_distinct(
        F.transform(
            positions,
            lambda p: F.xxhash64(
                *[F.element_at(F.col("w"), p + i) for i in range(n)]
            ),
        )
    )
    return words.select("doc_id", F.explode(grams).alias("g"))


@query(
    "ext_curation_pipeline",
    tier="C",
    oracle=f"""
    WITH corpus AS ({_WITH_COPIES_SQL}),
    shingled AS ({_SHINGLE8_SQL}),
    eval_sh AS (
      SELECT DISTINCT shingle FROM shingled WHERE {_EVAL_PRED_SQL}),
    contam AS (
      SELECT DISTINCT s.doc_id
      FROM shingled s JOIN eval_sh e ON s.shingle = e.shingle
      WHERE NOT {_EVAL_PRED_SQL}),
    feat AS (
      SELECT doc_id,
             {_LANG_PRED_SQL} AS lang_pred,
             {_QUALITY_SQL} AS quality,
             md5({_NORM_SQL.format(c="text")}) AS text_hash,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tok
      FROM corpus WHERE NOT {_EVAL_PRED_SQL}),
    s2f AS (
      SELECT *,
             (lang_pred <> 'und') AS s1,
             (lang_pred <> 'und' AND quality >= {_QUALITY_MIN}) AS s2
      FROM feat),
    ded AS (
      SELECT *,
             row_number() OVER (PARTITION BY text_hash
                                ORDER BY (NOT s2), doc_id) AS rn
      FROM s2f),
    flags AS (
      SELECT d.lang_pred, d.doc_id, d.n_tok, d.s1, d.s2,
             (d.s2 AND d.rn = 1) AS s3,
             (d.s2 AND d.rn = 1 AND c.doc_id IS NULL) AS s4
      FROM ded d LEFT JOIN contam c ON d.doc_id = c.doc_id),
    stage AS (
      SELECT lang_pred,
             CAST(count(*) AS BIGINT)                        AS n_in,
             CAST(count(*) FILTER (WHERE s1) AS BIGINT)      AS n_lang,
             CAST(count(*) FILTER (WHERE s2) AS BIGINT)      AS n_quality,
             CAST(count(*) FILTER (WHERE s3) AS BIGINT)      AS n_dedup,
             CAST(count(*) FILTER (WHERE s4) AS BIGINT)      AS n_clean,
             CAST(coalesce(sum(n_tok) FILTER (WHERE s4), 0) AS BIGINT)
                                                             AS clean_tokens
      FROM flags GROUP BY 1),
    rates AS (
      SELECT *,
             CASE WHEN clean_tokens > 0
                  THEN CAST(least(10000, floor(10000.0 * {_MIX_BUDGET_TOK}
                                               / clean_tokens)) AS BIGINT)
                  ELSE 0 END AS rate_pm
      FROM stage),
    kept AS (
      SELECT f.lang_pred,
             CAST(count(*) AS BIGINT)    AS kept_docs,
             CAST(sum(f.n_tok) AS BIGINT) AS kept_tokens
      FROM flags f JOIN rates r ON f.lang_pred = r.lang_pred
      WHERE f.s4 AND (f.doc_id * {_MIX_HASH}) % 10000 < r.rate_pm
      GROUP BY 1)
    SELECT r.lang_pred, r.n_in, r.n_lang, r.n_quality, r.n_dedup,
           r.n_clean, r.clean_tokens, r.rate_pm,
           CAST(coalesce(k.kept_docs, 0) AS BIGINT)   AS kept_docs,
           CAST(coalesce(k.kept_tokens, 0) AS BIGINT) AS kept_tokens
    FROM rates r LEFT JOIN kept k ON r.lang_pred = k.lang_pred
    """,
)
def ext_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chained curation funnel (see module docstring). Emits one audit
    row per predicted language: doc counts surviving each stage, the
    surviving token mass, the derived mix rate, and the sampled output."""
    is_eval = (F.col("doc_id") % 50 == 0) & (F.col("doc_id") < 1_000_000)
    raw = fan_out(_with_copies(load_table(spark, sf_dir, "documents")))
    train = raw.filter(~is_eval)

    # decontamination candidates: train docs sharing any 8-gram with the
    # held-out eval slice (eval shingle set broadcasts — it is a benchmark
    # suite, kilobytes at any corpus scale). At driver-fixture scales the
    # string-shingle/md5-free form is pinned (the DuckDB oracle replays it
    # verbatim); past the corpus gate the grams are xxhash64 word tuples —
    # see _shingle_hashes (equality-only key, value-identical contam set
    # modulo 64-bit collisions).
    import flink_cdc_connectors_spark.queries.tier_c as _TC

    if load_table(spark, sf_dir, "documents").count() <= _TC._MINHASH_SCALE_DOCS:
        eval_keyed = _shingles(raw.filter(is_eval), n=8).select(
            F.col("shingle").alias("g")
        )
        train_keyed = _shingles(train, n=8).select(
            "doc_id", F.col("shingle").alias("g")
        )
    else:
        eval_keyed = _shingle_hashes(raw.filter(is_eval), n=8).select("g")
        train_keyed = _shingle_hashes(train, n=8)
    contam = (
        train_keyed.join(F.broadcast(eval_keyed.distinct()), "g")
        .select("doc_id")
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )

    feat = train.select(
        "doc_id",
        lang_pred_col().alias("lang_pred"),
        quality_col().alias("quality"),
        F.md5(_norm_col(F.col("text"))).alias("text_hash"),
        F.size(F.split(F.trim("text"), " ")).cast("long").alias("n_tok"),
    )
    s1 = F.col("lang_pred") != "und"
    s2 = s1 & (F.col("quality") >= _QUALITY_MIN)
    ded = feat.withColumn("s1", s1).withColumn("s2", s2).withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("text_hash").orderBy((~F.col("s2")).cast("int"), "doc_id")
        ),
    )
    s3 = F.col("s2") & (F.col("rn") == 1)
    flags = (
        ded.join(contam, "doc_id", "left")
        .select(
            "lang_pred",
            "doc_id",
            "n_tok",
            "s1",
            "s2",
            s3.alias("s3"),
            (s3 & F.col("contaminated").isNull()).alias("s4"),
        )
        # two consumers below (stage aggregate + mix pass): cache the
        # narrow 7-column flag frame so the shingle join runs once
        .cache()
    )
    stage = flags.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_in"),
        F.count(F.when(F.col("s1"), 1)).alias("n_lang"),
        F.count(F.when(F.col("s2"), 1)).alias("n_quality"),
        F.count(F.when(F.col("s3"), 1)).alias("n_dedup"),
        F.count(F.when(F.col("s4"), 1)).alias("n_clean"),
        F.coalesce(F.sum(F.when(F.col("s4"), F.col("n_tok"))), F.lit(0))
        .cast("long")
        .alias("clean_tokens"),
    )
    rates = stage.withColumn(
        "rate_pm",
        F.when(
            F.col("clean_tokens") > 0,
            F.least(
                F.lit(10000),
                F.floor(F.lit(10000.0) * _MIX_BUDGET_TOK / F.col("clean_tokens")),
            ),
        )
        .otherwise(0)
        .cast("long"),
    )
    kept = (
        flags.filter("s4")
        .join(F.broadcast(rates.select("lang_pred", "rate_pm")), "lang_pred")
        .filter((F.col("doc_id") * F.lit(_MIX_HASH)) % 10000 < F.col("rate_pm"))
        .groupBy("lang_pred")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum("n_tok").alias("kept_tokens"),
        )
    )
    return rates.join(kept, "lang_pred", "left").select(
        "lang_pred",
        "n_in",
        "n_lang",
        "n_quality",
        "n_dedup",
        "n_clean",
        "clean_tokens",
        "rate_pm",
        F.coalesce("kept_docs", F.lit(0)).cast("long").alias("kept_docs"),
        F.coalesce("kept_tokens", F.lit(0)).cast("long").alias("kept_tokens"),
    )
