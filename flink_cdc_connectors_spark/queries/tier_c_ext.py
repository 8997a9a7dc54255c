"""Tier C extensions — training-data pipeline operators beyond the round-1
set: repetition scoring, PII scrubbing, deterministic stratified sampling,
GPT-style sequence packing, and shuffled sharding. These are the remaining
preprocessing stages a 100 TB pretraining corpus pipeline runs between raw
ingest (the CDC tiers) and tokenized output shards.

Design rules carried over from tier_c: every per-row computation is a pure
JVM Column expression (no Python in the row path); every sampling/ordering
decision is a deterministic integer computation reproducible in DuckDB, so
each key has a full value-level oracle — no RNG, no engine-specific hash.
The one driver-side structure is the ≤10k-row bucket prefix-sum inside
``global_running_sum`` (documented there), which replaces the
single-partition global window that sequence packing would otherwise need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from flink_cdc_connectors_spark.operators.cdc import global_running_sum
from flink_cdc_connectors_spark.queries.tier_c import (
    _EVAL_PRED_SQL,
    _QUALITY_SQL,
    _SHINGLE8_SQL,
    _WITH_COPIES_SQL,
)
from flink_cdc_connectors_spark.registry import query
from flink_cdc_connectors_spark.sources.loaders import fan_out, load_table

# eval predicate with the alias the decontaminate oracle's join uses
_EVAL_PRED_SQL_S = _EVAL_PRED_SQL.replace("doc_id", "s.doc_id")

# Knuth's multiplicative-hash constant: the same bigint arithmetic runs on
# both engines (doc_id * C stays < 2^63 for any plausible doc_id), giving a
# deterministic, uniform, engine-independent pseudo-random stream — the
# replacement for rand(seed), whose sequence Spark and DuckDB disagree on.
_MIX = 2654435761


# ---------------------------------------------------------------------------
# Repetition scoring
# ---------------------------------------------------------------------------


@query(
    "ext_repetition_ratio",
    tier="C",
    oracle="""
    SELECT doc_id,
           CAST(len(bg) AS BIGINT)                                      AS n_bigrams,
           round(1.0 - CAST(len(list_distinct(bg)) AS DOUBLE)/len(bg), 6) AS dup_bigram_ratio,
           CASE WHEN 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE)/len(bg) > 0.2
                THEN 1 ELSE 0 END                                       AS is_repetitive
    FROM (SELECT doc_id,
                 list_transform(range(1, len(string_split(text,' '))),
                                i -> string_split(text,' ')[i] || ' ' ||
                                     string_split(text,' ')[i+1]) AS bg
          FROM documents)
    """,
)
def ext_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-bigram ratio per document — the standard boilerplate /
    looping-text signal pretraining filters cut on (a doc that repeats the
    same bigrams is template or generation noise). One narrow projection:
    split -> in-row bigram transform -> distinct-count ratio, all JVM
    higher-order functions, zero shuffles, filter threshold 0.2."""
    d = load_table(spark, sf_dir, "documents")
    # Stage the split ONCE: referencing split(text) inside the bigram
    # lambda makes codegen re-split the doc per element — O(words^2)
    # chars scanned per row (measured 4x the query). A named intermediate
    # column is referenced, not recomputed (CollapseProject keeps
    # multi-referenced non-trivial aliases staged).
    words = d.select("doc_id", F.split("text", " ").alias("w"))
    bg = F.expr(
        "transform(sequence(1, size(w)-1), i -> concat(w[i-1], ' ', w[i]))"
    )
    staged = words.select("doc_id", bg.alias("bg"))
    ratio = (
        F.lit(1.0)
        - F.size(F.array_distinct("bg")).cast("double") / F.size("bg")
    )
    return staged.select(
        "doc_id",
        F.size("bg").cast("long").alias("n_bigrams"),
        F.round(ratio, 6).alias("dup_bigram_ratio"),
        F.when(ratio > 0.2, F.lit(1)).otherwise(F.lit(0)).alias("is_repetitive"),
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------


@query(
    "ext_pii_scrub",
    tier="C",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(
                 regexp_replace(
                   text || ' contact user' || doc_id || '@mail.example or +1-555-' ||
                     lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                   '[a-z0-9]+@[a-z][a-z.]+', '<EMAIL>', 'g'),
                 '\\+1-555-[0-9]{4}', '<PHONE>', 'g'))       AS scrubbed_md5,
           CAST(len(regexp_extract_all(
                 text || ' contact user' || doc_id || '@mail.example' ||
                   CASE WHEN doc_id % 3 = 0 THEN ' cc bot7@mail.example' ELSE '' END,
                 '[a-z0-9]+@[a-z][a-z.]+')) AS BIGINT)       AS n_emails,
           CAST(1 AS BIGINT)                                 AS n_phones
    FROM documents
    """,
)
def ext_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — regex-replace emails and phone numbers with typed
    placeholder tokens, plus per-doc redaction counts for audit. The
    fixture text is synthetic, so a deterministic contact block is appended
    first (same expression on both engines) and then scrubbed; patterns are
    kept to the RE2 ∩ java.util.regex common subset so both engines match
    identically. Pure regexp_replace projection — no shuffle, no UDF."""
    d = load_table(spark, sf_dir, "documents")
    with_pii = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id"),
        F.lit("@mail.example or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    email_pat = "[a-z0-9]+@[a-z][a-z.]+"
    phone_pat = r"\+1-555-[0-9]{4}"
    scrubbed = F.regexp_replace(
        F.regexp_replace(with_pii, email_pat, "<EMAIL>"), phone_pat, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.md5(scrubbed).alias("scrubbed_md5"),
        F.size(
            F.expr(
                "regexp_extract_all(concat(text, ' contact user', doc_id,"
                " '@mail.example',"
                " CASE WHEN doc_id % 3 = 0 THEN ' cc bot7@mail.example' ELSE '' END),"
                " '[a-z0-9]+@[a-z][a-z.]+', 0)"
            )
        )
        .cast("long")
        .alias("n_emails"),
        F.lit(1).cast("long").alias("n_phones"),
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------


@query(
    "ext_stratified_sample",
    tier="C",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE (doc_id * 2654435761) % 1000 <
          CASE WHEN lang = 'en' THEN 500 ELSE 200 END
    """,
)
def ext_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling — the domain-mixing step of a
    pretraining pipeline (keep 50% of 'en', 20% of everything else). The
    keep decision is a multiplicative-hash coin on doc_id, so the sample is
    (a) reproducible run-to-run and engine-to-engine, (b) a pure pushed-down
    filter — no sampling operator, no shuffle, and at 100 TB each executor
    decides locally from the row alone. Contrast df.sampleBy: seeded RNG,
    per-partition sequence, not reproducible across engines or repartitions."""
    d = load_table(spark, sf_dir, "documents")
    coin = (F.col("doc_id") * F.lit(_MIX)) % 1000
    rate = F.when(F.col("lang") == "en", F.lit(500)).otherwise(F.lit(200))
    return d.filter(coin < rate).select("doc_id", "lang", "source")


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-chunk)
# ---------------------------------------------------------------------------


@query(
    "ext_sequence_pack",
    tier="C",
    oracle="""
    WITH toks AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents),
    offs AS (
      SELECT doc_id, n_tok,
             CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS tok_offset
      FROM toks)
    SELECT doc_id, n_tok, tok_offset,
           CAST(tok_offset // 2048 AS BIGINT)    AS seq_id,
           CAST(tok_offset % 2048 AS BIGINT)     AS pos_in_seq,
           CASE WHEN tok_offset // 2048 <> (tok_offset + n_tok - 1) // 2048
                THEN 1 ELSE 0 END                AS crosses_boundary
    FROM offs
    """,
)
def ext_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: concatenate the corpus in doc_id order
    and chunk into 2048-token training sequences. Each doc's placement is
    the exclusive running sum of token counts — computed with the
    distributed bucketed prefix-sum (``global_running_sum``), NOT a global
    ``sum() OVER (ORDER BY ...)`` window, which would drag the whole corpus
    through one task. Emits the pack plan (seq_id, position, boundary-cross
    flag); the writer stage would groupBy(seq_id) to emit shards."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    offs = global_running_sum(
        toks, "doc_id", "n_tok", out_col="tok_offset", exclusive=True
    )
    return offs.select(
        "doc_id",
        "n_tok",
        "tok_offset",
        (F.col("tok_offset") / 2048).cast("long").alias("seq_id"),
        (F.col("tok_offset") % 2048).alias("pos_in_seq"),
        F.when(
            (F.col("tok_offset") / 2048).cast("long")
            != ((F.col("tok_offset") + F.col("n_tok") - 1) / 2048).cast("long"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("crosses_boundary"),
    )


# ---------------------------------------------------------------------------
# Shuffled sharding
# ---------------------------------------------------------------------------


@query(
    "ext_shuffle_shard",
    tier="C",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, (doc_id * 2654435761) % 999983 AS shuffle_key
      FROM documents)
    SELECT doc_id, shuffle_key,
           shuffle_key % 16 AS shard,
           CAST(row_number() OVER (PARTITION BY shuffle_key % 16
                                   ORDER BY shuffle_key, doc_id) AS BIGINT)
             AS pos_in_shard
    FROM keyed
    """,
)
def ext_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + sharding — the final training-order
    step: permute the corpus by a multiplicative hash (engine-reproducible,
    uniform) and split into 16 shards with a position within each shard.
    The only exchange is the hash shuffle on the shard id; the per-shard
    row_number window is partitioned (never a global sort). At 100 TB the
    shard count rises with the cluster and each shard sorts locally —
    exactly how a tokenizer-writer fleet consumes it."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id", ((F.col("doc_id") * F.lit(_MIX)) % 999983).alias("shuffle_key")
    )
    shard = (F.col("shuffle_key") % 16).alias("shard")
    w = W.partitionBy(F.col("shuffle_key") % 16).orderBy("shuffle_key", "doc_id")
    return keyed.select(
        "doc_id",
        "shuffle_key",
        shard,
        F.row_number().over(w).cast("long").alias("pos_in_shard"),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination / domain mixing
# ---------------------------------------------------------------------------


@query(
    "ext_decontaminate",
    tier="C",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text, lang, source, n_chars FROM documents
      UNION ALL
      SELECT doc_id + 1000000, upper(text) || '  ', lang, source, n_chars FROM documents
    ),
    shingled AS ({_SHINGLE8_SQL}),
    eval_sh AS (
      SELECT DISTINCT shingle FROM shingled
      WHERE {_EVAL_PRED_SQL})
    SELECT s.doc_id, CAST(count(DISTINCT s.shingle) AS BIGINT) AS n_hits
    FROM shingled s JOIN eval_sh e ON s.shingle = e.shingle
    WHERE NOT {_EVAL_PRED_SQL_S}
    GROUP BY 1
    """,
)
def ext_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — flag training documents sharing any
    8-gram with the held-out eval set (the GPT-3/PaLM-style n-gram overlap
    rule, sized to the fixture's 10-100-word docs; production uses 13).
    Eval set = originals with doc_id % 50 == 0; the corpus includes the
    planted perturbed copies, whose normalized text equals the original's —
    every copy of an eval doc MUST be flagged, making the check
    self-validating. The eval shingle set (distinct, tiny relative to the
    corpus) broadcasts; the train side never shuffles — at 100 TB the eval
    side is a benchmark suite, kilobytes of n-grams, and this stays one
    broadcast-join scan. Emits contaminated doc ids with matched-8-gram
    counts.

    Scale: past the corpus gate the grams are xxhash64 word 8-tuples
    (``_shingle_hashes`` — the same equality-membership twin
    ext_curation_pipeline uses; n_hits changes only on a 64-bit
    collision), skipping the slice+array_join string assembly measured
    as this family's dominant 100x cost. Below the gate the
    string-shingle form is pinned verbatim by the DuckDB oracle."""
    import flink_cdc_connectors_spark.queries.tier_c as _TC
    from flink_cdc_connectors_spark.queries.tier_c import _shingles, _with_copies
    from flink_cdc_connectors_spark.queries.tier_c_ext6 import _shingle_hashes

    # fan_out only when the scan is narrow: 8-gram shingling is the
    # CPU-heavy stage and the fixture file is one row group (see
    # loaders.fan_out) — without it the whole corpus shingles on one core
    # (measured 15 s -> ~2 s at sf0.1); the ladder fixtures already scan
    # wide and the repartition would be pure overhead there.
    raw = load_table(spark, sf_dir, "documents")
    corpus = _with_copies(raw)
    if raw.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        corpus = fan_out(corpus)
    is_eval = (F.col("doc_id") % 50 == 0) & (F.col("doc_id") < 1_000_000)
    # Filter BEFORE shingling on both branches: the eval side shingles only
    # the held-out 2%, the probe side shingles each train doc exactly once —
    # one full shingling pass total, regardless of how Catalyst handles
    # filter-through-Generate.
    if raw.count() <= _TC._MINHASH_SCALE_DOCS:
        eval_sh = _shingles(corpus.filter(is_eval), n=8).select("shingle").distinct()
        train_sh = _shingles(corpus.filter(~is_eval), n=8)
    else:
        eval_sh = (
            _shingle_hashes(corpus.filter(is_eval), n=8)
            .select(F.col("g").alias("shingle"))
            .distinct()
        )
        train_sh = _shingle_hashes(corpus.filter(~is_eval), n=8).select(
            "doc_id", F.col("g").alias("shingle")
        )
    return (
        train_sh.join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count_distinct("shingle").alias("n_hits"))
    )


@query(
    "ext_domain_mix",
    tier="C",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tok
      FROM documents),
    totals AS (
      SELECT lang, CAST(sum(n_tok) AS BIGINT) AS corpus_tokens FROM toks GROUP BY 1),
    rates AS (
      SELECT lang, corpus_tokens,
             CAST(least(10000, floor(10000.0 * 2000 / corpus_tokens)) AS BIGINT) AS rate_pm
      FROM totals),
    kept AS (
      SELECT t.lang, t.n_tok
      FROM toks t JOIN rates r ON t.lang = r.lang
      WHERE (t.doc_id * 2654435761) % 10000 < r.rate_pm)
    SELECT r.lang, r.corpus_tokens, r.rate_pm,
           CAST(coalesce(count(k.n_tok), 0) AS BIGINT) AS kept_docs,
           CAST(coalesce(sum(k.n_tok), 0) AS BIGINT)   AS kept_tokens
    FROM rates r LEFT JOIN kept k ON r.lang = k.lang
    GROUP BY 1, 2, 3
    """,
)
def ext_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget domain mixing — the sampling stage that reshapes a raw
    corpus to target mixture weights (here: 2000 tokens per language). The
    per-stratum keep rate is derived from one token-count aggregate
    (broadcast back as a 5-row dim), and the keep decision is the same
    multiplicative-hash coin as ``ext_stratified_sample`` — reproducible
    across engines, runs, and repartitionings, applied as a plain filter.
    Integer permille rates (floor) keep the rate computation
    engine-identical. Emits the per-language mix audit: corpus tokens,
    applied rate, kept docs/tokens."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.size(F.split(F.trim("text"), " ")).cast("long").alias("n_tok")
    )
    totals = toks.groupBy("lang").agg(F.sum("n_tok").alias("corpus_tokens"))
    rates = totals.select(
        "lang",
        "corpus_tokens",
        F.least(
            F.lit(10000),
            F.floor(F.lit(10000.0) * 2000 / F.col("corpus_tokens")),
        )
        .cast("long")
        .alias("rate_pm"),
    )
    kept = (
        toks.join(F.broadcast(rates), "lang")
        .filter((F.col("doc_id") * F.lit(2654435761)) % 10000 < F.col("rate_pm"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum("n_tok").alias("kept_tokens"),
        )
    )
    return (
        rates.join(kept, "lang", "left")
        .select(
            "lang",
            "corpus_tokens",
            "rate_pm",
            F.coalesce("kept_docs", F.lit(0)).cast("long").alias("kept_docs"),
            F.coalesce("kept_tokens", F.lit(0)).cast("long").alias("kept_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Duplicate-cluster resolution (connected components)
# ---------------------------------------------------------------------------

# tier_c registers before tier_c_ext in _QUERY_MODULES, so its specs are
# available at import time; the cluster oracle nests the verified pair
# query's oracle as its edge list — one source of truth for "near-dup".
from flink_cdc_connectors_spark.queries import tier_c as _tc  # noqa: E402
from flink_cdc_connectors_spark.registry import _REGISTRY as _REG  # noqa: E402

_PAIRS_SQL = _REG["ext_dedup_ngram_jaccard"].oracle


@query(
    "ext_dedup_cluster",
    tier="C",
    oracle=f"""
    WITH RECURSIVE
    pairs AS ({_PAIRS_SQL}),
    sym AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT a AS id FROM sym),
    reach(id, lab) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT r.id, s.b FROM reach r JOIN sym s ON r.lab = s.a
    )
    SELECT id AS doc_id, min(lab) AS cluster_id,
           CASE WHEN min(lab) = id THEN 1 ELSE 0 END AS is_keeper
    FROM reach GROUP BY id
    """,
)
def ext_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-CLUSTER resolution — the step after pair finding that real
    dedup pipelines need: near-dup pairs form a graph, each connected
    component is one duplicate cluster, and exactly one doc per cluster
    (the minimum id) is kept. Pairs come from the verified 3-gram Jaccard
    query; components by iterative min-label propagation — each round is
    one bounded equi-join + aggregate, and the loop stops when no label
    changes (<= graph diameter rounds; duplicate clusters are shallow, so
     2-3 in practice). The 100 TB path — two-phase large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond"), O(log n) rounds regardless of diameter — is IMPLEMENTED as
    ``operators/graph.py::connected_components`` and proven equivalent on
    this exact pair graph plus chain/random graphs in tests/test_graph.py;
    label propagation stays the default here because near-dup clusters are
    shallow and it converges in fewer, cheaper rounds. The oracle computes
    the same fixpoint with a recursive CTE."""
    pairs = _tc.ext_dedup_ngram_jaccard(spark, sf_dir).select("id_a", "id_b")
    # The candidate graph is tiny relative to the corpus (near-dup pairs
    # only) — materialize it ONCE with an eager localCheckpoint so the
    # expensive pair-finding lineage (shingle self-join) never re-executes,
    # and every loop round below starts from in-memory blocks with a
    # 1-join-deep plan. Per-round localCheckpoint keeps the plan from
    # growing one join per iteration (the round-1 shape re-analyzed and
    # re-optimized an ever-deeper tree each round — measured 36 s for a
    # 3-round converge; checkpointed, the loop is <2 s).
    sym = (
        pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        .unionByName(pairs.select(F.col("id_b").alias("a"), F.col("id_a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("lab", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(16):
        neigh = (
            sym.join(labels, sym.b == labels.id)
            .groupBy("a")
            .agg(F.min("lab").alias("nlab"))
        )
        # LAZY checkpoint + a full-scan count aggregate: ONE job both
        # materializes the round's label blocks (a lazy localCheckpoint
        # persists on first compute, and the count scans every partition)
        # and returns the convergence count — round 12's eager-checkpoint
        # + limit(1).count() shape paid a second job per round just to
        # learn whether anything changed (VERDICT r12 #4).
        new_labels = (
            labels.join(neigh, labels.id == neigh.a, "left")
            .select(
                "id",
                F.least(F.col("lab"), F.coalesce("nlab", F.col("lab"))).alias("lab"),
                (F.coalesce("nlab", F.col("lab")) < F.col("lab")).alias("__chg"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.agg(
            F.count(F.when(F.col("__chg"), 1)).alias("n")
        ).first()[0]
        labels = new_labels.drop("__chg")
        if changed == 0:
            break
    return labels.select(
        F.col("id").alias("doc_id"),
        F.col("lab").alias("cluster_id"),
        F.when(F.col("lab") == F.col("id"), F.lit(1)).otherwise(F.lit(0)).alias(
            "is_keeper"
        ),
    )


def _duck_minhash_recall_oracle() -> str:
    """Replays the SHIPPED xxhash64 MinHash family (VERDICT r10 #3 — the
    md5 stand-in predated functions/xxhash_sql.py; now that the production
    family is oracle-replayable, the recall measurement describes the path
    ``ext_dedup_minhash`` actually ships).  Same staged-CTE machinery as
    ``_duck_minhash_oracle``: member i's seed is Spark's
    xxhash64-of-int(i) intermediate (spark_seed_for_int), hashing runs
    once per DISTINCT shingle, and min() over the SIGNED value mirrors
    Spark's array_min over longs.  The ground-truth (exact Jaccard) CTEs
    are hash-family-independent and unchanged."""
    from flink_cdc_connectors_spark.functions.xxhash_sql import (
        duck_utf8_bytes_sql,
        duck_xxh64_family_staged_ctes,
        spark_seed_for_int,
    )
    from flink_cdc_connectors_spark.queries.tier_c import _SHINGLE_SQL

    seeds = [(i, spark_seed_for_int(i)) for i in range(16)]
    hash_ctes = duck_xxh64_family_staged_ctes("db2", seeds, "hw")
    mins = ",".join(f"min(m{i}) AS mh{i}" for i in range(16))

    def bands(n_bands: int, rows_per: int) -> str:
        selects = []
        for b in range(n_bands):
            cols = "||'|'||".join(
                f"CAST(mh{b * rows_per + r} AS VARCHAR)" for r in range(rows_per)
            )
            selects.append(f"SELECT doc_id, {b} AS band_id, {cols} AS band_sig FROM sig")
        return " UNION ALL ".join(selects)

    def config(name: str, tag: str) -> str:
        return f"""
        SELECT '{name}' AS method,
               (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
               (SELECT CAST(count(*) AS BIGINT) FROM cand_{tag}) AS n_cand,
               (SELECT CAST(count(*) AS BIGINT) FROM found_{tag}) AS n_found,
               CASE WHEN (SELECT count(*) FROM truth) > 0
                    THEN round((SELECT count(*) FROM found_{tag})
                               / (SELECT count(*)::DOUBLE FROM truth), 4)
                    ELSE 1.0 END AS recall"""

    return f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 200
      UNION ALL
      SELECT doc_id + 1000000,
             array_to_string(string_split_regex(trim(text), '\\s+')[1:-2], ' ')
      FROM documents
      WHERE doc_id < 200 AND len(string_split_regex(trim(text), '\\s+')) > 12
    ),
    shingled AS MATERIALIZED ({_SHINGLE_SQL}),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingled GROUP BY 1),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM shingled a JOIN shingled b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    truth AS (
      SELECT id_a, id_b FROM common
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.6),
    dist AS (SELECT DISTINCT shingle FROM shingled),
    db2 AS (SELECT shingle, b, len(b) AS n
            FROM (SELECT shingle, {duck_utf8_bytes_sql('shingle')} AS b FROM dist)),
    {hash_ctes},
    sh AS MATERIALIZED (
      SELECT s.doc_id, {", ".join(f"h.h_{i} AS m{i}" for i in range(16))}
      FROM shingled s JOIN hw h USING (shingle)),
    sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
    bands_hp AS ({bands(4, 4)}),
    cand_hp AS (
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      FROM bands_hp x JOIN bands_hp y
        ON x.band_id = y.band_id AND x.band_sig = y.band_sig
       AND x.doc_id < y.doc_id),
    found_hp AS (SELECT id_a, id_b FROM cand_hp JOIN truth USING (id_a, id_b)),
    bands_hr AS ({bands(8, 2)}),
    cand_hr AS (
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      FROM bands_hr x JOIN bands_hr y
        ON x.band_id = y.band_id AND x.band_sig = y.band_sig
       AND x.doc_id < y.doc_id),
    found_hr AS (SELECT id_a, id_b FROM cand_hr JOIN truth USING (id_a, id_b))
    {config('minhash-lsh-4x4', 'hp')}
    UNION ALL {config('minhash-lsh-8x2', 'hr')}
    """


@query("ext_minhash_recall", tier="C", oracle=_duck_minhash_recall_oracle())
def ext_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall AND cost of MinHash-LSH banding against the exact
    3-gram Jaccard >= 0.6 ground truth — the text-side counterpart of
    ``ext_ann_recall``. HASH-CHECKED since round 3; since round 11 it
    measures the SHIPPED hash family (VERDICT r10 #3): the same
    xxhash64 members ``ext_dedup_minhash`` ships
    (functions/text.py::minhash_signature — min over shingles of
    ``xxhash64(lit(i), shingle)``), replayed bit-for-bit in DuckDB by
    functions/xxhash_sql.py, so the driver's value hash covers recall
    numbers that describe the production dedup path, not an md5 stand-in
    (the stand-in predated the xxhash64 oracle; a same-fixture family A/B
    is recorded in BASELINE.md round 11). Banding here concatenates the
    band's minhashes as the signature — an equality key with the same
    collision structure as production's xxhash64-fold band signature
    (a fold collision adds P ~ 2^-64 per pair, unobservable).
    Two operating points from the SAME 16 minhashes: 4 bands x 4 rows
    (high precision) and 8 bands x 2 rows (high recall, more candidates).
    Output per config: truth pairs, candidate pairs BEFORE verification
    (the cost proxy — every candidate pays one exact-verify), verified
    pairs found, and recall. Truth on the same bounded slice the exact
    verifier uses; all pair math is set algebra on cached shingle arrays —
    no corpus-wide shingle explode. FULLY LAZY: counts are cross-joined
    one-row aggregates (the ext_ann_recall pattern), so the builder fires
    zero driver actions and the whole measurement is one job at the sink
    (the round-1 form ran ~6 .count() actions inside the builder —
    measured ~2x this query's bench cost in repeated cache-fill/stage
    overhead)."""
    from flink_cdc_connectors_spark.functions import text as T

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    words = F.split(F.trim(F.col("text")), r"\s+")
    near = docs.filter(F.size(words) > 12).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(F.slice(words, 1, F.size(words) - 1), " ").alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(near)
    # sh carries BOTH the string shingles (the minhash family hashes the
    # strings — the signature stage must stay bit-identical) and a 64-bit
    # hashed form for the exact-Jaccard passes (round 12): array_intersect
    # over ~100-element STRING arrays was the profiled dominant term of
    # this key's single job (~80k brute-force pairs x string hashing);
    # intersecting xxhash64 longs is the same set algebra at integer
    # cost.  A hash collision perturbs a Jaccard count with P ~ 2^-64 per
    # shingle pair — the same unobservable-collision argument the banded
    # signature fold already documents.
    sh = corpus.select(
        "doc_id",
        T.shingles(T.words_sql("text")).alias("sh"),
        F.expr(
            "array_distinct(transform("
            + T.shingles_sql(T.words_sql("text"))
            + ", s -> xxhash64(s)))"
        ).alias("shh"),
    ).cache()

    a = sh.select(F.col("doc_id").alias("id_a"), F.col("shh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("shh").alias("sh_b"))
    n_common = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = n_common / (F.size("sh_a") + F.size("sh_b") - n_common)
    truth = (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .filter(jac >= 0.6)
        .select("id_a", "id_b")
        .cache()
    )
    truth_agg = truth.agg(F.count(F.lit(1)).alias("n_truth"))

    # The shipped family, as a pure PROJECTION over the cached shingle
    # arrays (round 11 — the md5 form needed an explode + groupBy MIN
    # shuffle; the xxhash64 members are array_min over longs, which is
    # cache-safe by value, so the signature stage is now shuffle-free,
    # exactly like production ext_dedup_minhash)
    sig = sh.select("doc_id", *T.minhash_signature("sh", 16)).cache()

    def config(n_bands: int, rows_per: int) -> DataFrame:
        band_arr = "array(" + ",".join(
            "concat_ws('|',"
            + ",".join(
                f"cast(mh{bd * rows_per + r} as string)" for r in range(rows_per)
            )
            + ")"
            for bd in range(n_bands)
        ) + ")"
        bands = sig.select(
            "doc_id",
            F.posexplode(F.expr(band_arr)).alias("band_id", "band_sig"),
        )
        cand = (
            bands.alias("x")
            .join(
                bands.alias("y"),
                (F.col("x.band_id") == F.col("y.band_id"))
                & (F.col("x.band_sig") == F.col("y.band_sig"))
                & (F.col("x.doc_id") < F.col("y.doc_id")),
            )
            .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"))
            .distinct()
            .cache()
        )
        found = (
            cand.join(a, "id_a").join(b, "id_b").filter(jac >= 0.6).select("id_a", "id_b")
        )
        return (
            cand.agg(F.count(F.lit(1)).alias("n_cand"))
            .crossJoin(found.agg(F.count(F.lit(1)).alias("n_found")))
            .crossJoin(truth_agg)
            .select(
                F.lit(f"minhash-lsh-{n_bands}x{rows_per}").alias("method"),
                "n_truth",
                "n_cand",
                "n_found",
                F.when(F.col("n_truth") > 0, F.round(F.col("n_found") / F.col("n_truth"), 4))
                .otherwise(F.lit(1.0))
                .alias("recall"),
            )
        )

    return config(4, 4).unionByName(config(8, 2))


@query(
    "ext_dedup_keeper_quality",
    tier="C",
    oracle=f"""
    WITH RECURSIVE
    pairs AS ({_PAIRS_SQL}),
    sym AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT a AS id FROM sym),
    reach(id, lab) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT r.id, s.b FROM reach r JOIN sym s ON r.lab = s.a
    ),
    clusters AS (SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id),
    corpus AS ({_WITH_COPIES_SQL}),
    q AS (SELECT doc_id, {_QUALITY_SQL} AS quality FROM corpus),
    ranked AS (
      SELECT c.cluster_id, c.doc_id, q.quality,
             row_number() OVER (PARTITION BY c.cluster_id
                                ORDER BY q.quality DESC, c.doc_id) AS rn
      FROM clusters c JOIN q USING (doc_id))
    SELECT cluster_id,
           CAST(count(*) AS BIGINT)                     AS n_members,
           max(CASE WHEN rn = 1 THEN doc_id END)        AS keeper_id,
           max(CASE WHEN rn = 1 THEN quality END)       AS keeper_quality,
           round(min(quality), 4)                       AS min_quality
    FROM ranked
    GROUP BY cluster_id
    """,
)
def ext_dedup_keeper_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-priority keeper selection — what production dedup actually
    does after clustering: within each duplicate cluster keep the
    HIGHEST-QUALITY member (ties broken by id), not blindly the smallest
    id. Clusters come from the same connected components as
    ext_dedup_cluster; quality is the shared C4/Gopher-style heuristic
    (tier_c.quality_col — originals and their perturbed copies score
    differently because the copies are uppercased/padded, so the choice is
    real, and min-id would pick wrongly whenever the copy outranks the
    original). One window rank inside each cluster; the cluster table is
    near-dup-pairs-sized, orders of magnitude below the corpus, so this
    whole stage is a small-data epilogue to the pair finding.
    """
    from flink_cdc_connectors_spark.queries.tier_c import quality_col

    clusters = ext_dedup_cluster(spark, sf_dir).select("doc_id", "cluster_id")
    corpus = _tc._with_copies(load_table(spark, sf_dir, "documents"))
    q = corpus.select("doc_id", quality_col().alias("quality"))
    ranked = clusters.join(q, "doc_id").withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("cluster_id").orderBy(F.col("quality").desc(), F.col("doc_id"))
        ),
    )
    return ranked.groupBy("cluster_id").agg(
        F.count("*").alias("n_members"),
        F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("keeper_id"),
        F.max(F.when(F.col("rn") == 1, F.col("quality"))).alias("keeper_quality"),
        F.round(F.min("quality"), 4).alias("min_quality"),
    )


def _duck_dedup_incremental_oracle() -> str:
    from flink_cdc_connectors_spark.queries.tier_c import _SHINGLE_SQL

    mins = ",".join(f"min(md5('{i}:' || shingle)) AS mh{i}" for i in range(16))
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band_id, {cols} AS band_sig FROM sig".format(
            b=b, cols="||'|'||".join(f"mh{b * 4 + r}" for r in range(4))
        )
        for b in range(4)
    )
    return f"""
    WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
    near_c AS (
      SELECT doc_id + 1000000 AS doc_id,
             array_to_string(string_split_regex(trim(text), '\\s+')[1:-2], ' ') AS text
      FROM base WHERE doc_id % 5 <> 0
        AND len(string_split_regex(trim(text), '\\s+')) > 12),
    near_b AS (
      SELECT doc_id + 2000000 AS doc_id,
             array_to_string(string_split_regex(trim(text), '\\s+')[1:-2], ' ') AS text
      FROM base WHERE doc_id % 5 = 0
        AND len(string_split_regex(trim(text), '\\s+')) > 12),
    corpus AS (
      SELECT doc_id, text FROM base
      UNION ALL SELECT * FROM near_c
      UNION ALL SELECT * FROM near_b),
    is_batch AS (
      SELECT doc_id,
             (doc_id >= 1000000 OR doc_id % 5 = 0) AS b
      FROM corpus),
    shingled AS ({_SHINGLE_SQL}),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingled GROUP BY 1),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM shingled a JOIN shingled b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    jpairs AS (
      SELECT id_a, id_b FROM common
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.6),
    sig AS (SELECT doc_id, {mins} FROM shingled GROUP BY doc_id),
    bands AS ({band_rows}),
    cand AS (
      SELECT DISTINCT least(x.doc_id, y.doc_id) AS id_a,
             greatest(x.doc_id, y.doc_id) AS id_b
      FROM bands x JOIN bands y
        ON x.band_id = y.band_id AND x.band_sig = y.band_sig
       AND x.doc_id < y.doc_id
      JOIN is_batch bx ON bx.doc_id = x.doc_id
      JOIN is_batch by_ ON by_.doc_id = y.doc_id
      WHERE bx.b OR by_.b),
    verified AS (SELECT id_a, id_b FROM cand JOIN jpairs USING (id_a, id_b)),
    batch_docs AS (SELECT doc_id FROM is_batch WHERE b),
    dup_counts AS (
      SELECT bd.doc_id,
             CAST(count(*) FILTER (WHERE NOT other.b) AS BIGINT) AS n_corpus_dups,
             CAST(count(*) FILTER (WHERE other.b
                                   AND other.doc_id < bd.doc_id) AS BIGINT)
               AS n_batch_dups
      FROM batch_docs bd
      LEFT JOIN (
        SELECT id_a AS me, id_b AS them FROM verified
        UNION ALL SELECT id_b, id_a FROM verified) v ON v.me = bd.doc_id
      LEFT JOIN is_batch other ON other.doc_id = v.them
      GROUP BY 1)
    SELECT doc_id, n_corpus_dups, n_batch_dups,
           CASE WHEN n_corpus_dups = 0 AND n_batch_dups = 0
                THEN 1 ELSE 0 END AS keep
    FROM dup_counts
    """


@query("ext_dedup_incremental", tier="C", oracle=_duck_dedup_incremental_oracle())
def ext_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL near-dup dedup — the production shape every batch-mode
    key skips: a NEW crawl batch is deduplicated against an EXISTING
    corpus (whose MinHash band index is precomputed and stored) plus
    itself, and the corpus is NEVER self-joined. A batch doc is dropped if
    it near-dups (exact Jaccard >= 0.6 on LSH candidates) any corpus doc,
    or an earlier-kept batch doc (min-id priority within the batch). The
    fixture plants near-copies of corpus docs INTO the batch (re-crawled
    content -> corpus dups) and near-copies of batch docs (intra-batch
    dups), so both drop reasons occur and are separately counted.

    Uses the md5-string MinHash family (functions/text.py::
    minhash_signatures_md5) so the DuckDB oracle replays signatures,
    banding, the asymmetric candidate join, and the verification —
    hash-checked end to end.  Since round 11 the xxhash64 family is
    ALSO oracle-replayable (functions/xxhash_sql.py); this key keeps md5
    as a cost choice — its oracle already replays the full incremental
    MERGE shape, and the staged xxhash pipeline would add ~5 s per
    driver-gate run for zero semantic gain (the dedup verdicts are
    family-independent set algebra; family parity itself is pinned by
    ext_dedup_minhash and ext_minhash_recall on the shipped family).

    Scale: this is the daily-increment 100 TB pattern — per-increment
    cost is O(batch) signatures + band joins against a STORED index
    (here rebuilt in-query because parquet fixtures carry no state;
    the join SHAPE is identical), never O(corpus^2); the batch self-join
    is small-side x small-side."""
    from flink_cdc_connectors_spark.functions import text as T

    base = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    words = F.split(F.trim(F.col("text")), r"\s+")
    # drop the LAST word — the pairing DuckDB's [1:-2] slice expresses
    # (same near-copy recipe as ext_minhash_recall, whose parity pins it)
    drop_last = F.array_join(F.slice(words, 1, F.size(words) - 1), " ")
    near_c = (
        base.filter((F.col("doc_id") % 5 != 0) & (F.size(words) > 12))
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"), drop_last.alias("text"))
    )
    near_b = (
        base.filter((F.col("doc_id") % 5 == 0) & (F.size(words) > 12))
        .select((F.col("doc_id") + 2_000_000).alias("doc_id"), drop_last.alias("text"))
    )
    all_docs = base.select("doc_id", "text").unionByName(near_c).unionByName(near_b)
    batch_pred = (F.col("doc_id") >= 1_000_000) | (F.col("doc_id") % 5 == 0)

    # one shingle frame for both sides (eager checkpoint: consumed by the
    # band join's concurrent stages AND the verify joins)
    sh = all_docs.select(
        "doc_id", T.shingles(T.words_sql("text")).alias("sh"), batch_pred.alias("b")
    ).localCheckpoint(eager=True)
    sig = T.minhash_signatures_md5(sh, "doc_id", "sh", 16)
    sig = sig.join(sh.select("doc_id", "b"), "doc_id")
    bands = sig.select(
        "doc_id",
        "b",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws("|", *[F.col(f"mh{bd * 4 + r}") for r in range(4)])
                    for bd in range(4)
                ]
            )
        ).alias("band_id", "band_sig"),
    )
    # asymmetric candidate join: at least one side is the batch — the
    # corpus never pairs with itself (the incremental-cost contract)
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_sig") == F.col("y.band_sig"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .filter(F.col("x.b") | F.col("y.b"))
        .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"))
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    n_common = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = n_common / (F.size("sh_a") + F.size("sh_b") - n_common)
    verified = cand.join(sa, "id_a").join(sb, "id_b").filter(jac >= 0.6).select("id_a", "id_b")
    # per-batch-doc drop accounting: symmetrize pairs, classify the OTHER
    # side (corpus, or an earlier batch doc)
    sym = verified.select(
        F.col("id_a").alias("me"), F.col("id_b").alias("them")
    ).unionByName(verified.select(F.col("id_b").alias("me"), F.col("id_a").alias("them")))
    other = sh.select(F.col("doc_id").alias("them"), F.col("b").alias("them_b"))
    batch_docs = sh.filter("b").select("doc_id")
    counts = (
        batch_docs.join(sym, batch_docs.doc_id == sym.me, "left")
        .join(other, "them", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.when(~F.col("them_b"), 1)).alias("n_corpus_dups"),
            F.count(
                F.when(F.col("them_b") & (F.col("them") < F.col("doc_id")), 1)
            ).alias("n_batch_dups"),
        )
    )
    return counts.select(
        "doc_id",
        "n_corpus_dups",
        "n_batch_dups",
        F.when((F.col("n_corpus_dups") == 0) & (F.col("n_batch_dups") == 0), 1)
        .otherwise(0)
        .alias("keep"),
    )
