"""Tier C — LLM-data-pipeline extensions (SURVEY.md §2.C).

Dedup (exact / n-gram Jaccard / MinHash-LSH), similarity search over
embeddings, text analysis (tokens, quality, language-ID, fingerprints), and
multimodal (binary payload) plumbing — designed Spark-first for 100 TB:
no driver-side loops, dedup joins keyed on bounded-cardinality
shingles/buckets, the brute-force kNN kept as the small-side-broadcast
baseline with an LSH-bucketed scale path.

The fixture corpus has no duplicate texts, so dedup queries union the
corpus with deterministically perturbed copies (case-flipped / truncated)
— the operator must collapse exactly those planted pairs, which makes the
checks self-validating rather than vacuous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from flink_cdc_connectors_spark.functions.vectors import round_half_up6 as _rhu6
from flink_cdc_connectors_spark.registry import query
from flink_cdc_connectors_spark.sources.loaders import fan_out, load_table

# Offset added to doc_id for planted duplicate copies.
_COPY_OFFSET = 1_000_000

# ext_dedup_minhash: largest docs count that keeps the pinned string-shingle
# hash family (driver fixtures: sf0.1 has ~6k docs; the 100x scale ladder
# starts at ~98k corpus rows). Past this the word-triple family applies —
# see the scale-mode comment inside the query.
_MINHASH_SCALE_DOCS = 24_000

# Hard cap on the comparison side of the exact embedding-dedup verifier:
# 200k rows x 64 float64 ~= 100 MB broadcast — the verifier is bounded BY
# CONTRACT (the unbounded path is ext_dedup_embedding_lsh), and the guard
# turns "silently OOM the driver at 100x" into an explicit refusal.
_VERIFIER_MAX_ROWS = 200_000

# Normalization shared by dedup queries: lowercase, collapse whitespace, trim.
_NORM_SQL = "lower(trim(regexp_replace({c}, '\\s+', ' ', 'g')))"


def _norm_col(c):
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def _with_copies(docs: DataFrame) -> DataFrame:
    """documents ∪ perturbed copies (uppercased + padded, same normalized text)."""
    copies = docs.select(
        (F.col("doc_id") + _COPY_OFFSET).alias("doc_id"),
        F.concat(F.upper("text"), F.lit("  ")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    return docs.unionByName(copies)


_WITH_COPIES_SQL = f"""
  SELECT doc_id, text, lang, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + {_COPY_OFFSET}, upper(text) || '  ', lang, source, n_chars FROM documents
"""


@query(
    "ext_dedup_exact_text",
    tier="C",
    oracle=f"""
    SELECT min(doc_id)              AS keeper_id,
           CAST(count(*) AS BIGINT) AS n_dupes,
           md5({_NORM_SQL.format(c="text")}) AS text_hash
    FROM ({_WITH_COPIES_SQL})
    GROUP BY 3
    """,
)
def ext_dedup_exact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text: hash-groupBy, keep the smallest
    doc_id per content hash. One shuffle on the hash; at 100 TB the hash
    (not the text) is the shuffle key, so record width stays small."""
    corpus = _with_copies(load_table(spark, sf_dir, "documents"))
    return (
        corpus.withColumn("text_hash", F.md5(_norm_col(F.col("text"))))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keeper_id"), F.count(F.lit(1)).alias("n_dupes"))
        .select("keeper_id", "n_dupes", "text_hash")
    )


# --- n-gram Jaccard near-dup ------------------------------------------------

_SHINGLE_SQL = f"""
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(words) - 2, 0)),
           i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))) AS shingle
  FROM (
    SELECT doc_id, string_split_regex({_NORM_SQL.format(c="text")}, '\\s+') AS words
    FROM corpus)
"""


# 8-gram variant over a `corpus` CTE plus the eval-set predicate — ONE
# definition shared by ext_decontaminate and ext_bloom_decontaminate so the
# two keys stay directly comparable (same normalization, same sampling).
_SHINGLE8_SQL = """
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(words) - 7, 0)),
           i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' ' ||
                words[i+3] || ' ' || words[i+4] || ' ' || words[i+5] || ' ' ||
                words[i+6] || ' ' || words[i+7]))) AS shingle
  FROM (SELECT doc_id,
               string_split_regex(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), '\\s+') AS words
        FROM corpus)
"""

_EVAL_PRED_SQL = "(doc_id % 50 = 0 AND doc_id < 1000000)"


def _shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) pairs: distinct word n-grams of normalized text.

    ``slice`` + ``array_join`` per position instead of n ``element_at``
    lookups inside the lambda: the element_at tree is evaluated interpreted
    (measured 7x slower at sf0.1 — 35 s vs 5 s for the 8-gram corpus);
    slice+join stays a single vectorized array op. Values are identical.
    Docs shorter than n words produce no shingles (sequence(1, 0) would
    DESCEND in Spark, unlike DuckDB's empty generate_series — guard it).
    """
    words = docs.select(
        "doc_id", F.split(_norm_col(F.col("text")), r"\s+").alias("words")
    )
    positions = F.when(
        F.size("words") >= n,
        F.sequence(F.lit(1), F.size("words") - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    grams = words.select(
        "doc_id",
        F.array_distinct(
            F.transform(positions, lambda i: F.array_join(F.slice("words", i, n), " "))
        ).alias("shingles"),
    )
    # explode_OUTER, not explode: a plain explode makes Catalyst's
    # InferFiltersFromGenerate synthesize `size(shingles) > 0 AND
    # isnotnull(shingles)` and push it below the fan_out repartition, where
    # the whole shingle expression is re-evaluated per predicate — measured
    # 13x the query (6.5s -> 0.5s at sf0.1) because the pushed filter also
    # runs on the UNPARALLELIZED pre-repartition scan. Outer explode infers
    # no filter; short docs yield one null row, dropped by the cheap
    # post-generate filter on the OUTPUT column — identical results.
    return (
        grams.select("doc_id", F.explode_outer("shingles").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
    )


@query(
    "ext_dedup_ngram_jaccard",
    tier="C",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 200
      UNION ALL
      SELECT doc_id + {_COPY_OFFSET},
             array_to_string(string_split_regex(trim(text), '\\s+')[1:-2], ' ')
      FROM documents WHERE doc_id < 200 AND len(string_split_regex(trim(text), '\\s+')) > 12
    ),
    shingled AS ({_SHINGLE_SQL}),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM shingled GROUP BY 1),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_common
      FROM shingled a JOIN shingled b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common), 4) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.6
    """,
)
def ext_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact 3-gram Jaccard >= 0.6: explode distinct
    shingles, self-join on shingle, |A∩B| / (|A|+|B|-|A∩B|). Scale notes:
    the join key is the shingle (bounded fan-out per shingle in real
    corpora); at 100 TB the MinHash-LSH variant (``ext_dedup_minhash``)
    replaces the exact self-join, and this exact form remains the verifier
    for candidate pairs. Planted near-copies (last word dropped) guarantee
    non-vacuous matches."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    words = F.split(F.trim(F.col("text")), r"\s+")
    near = (
        docs.filter(F.size(words) > 12)
        .select(
            (F.col("doc_id") + _COPY_OFFSET).alias("doc_id"),
            F.array_join(F.slice(words, 1, F.size(words) - 1), " ").alias("text"),
        )
    )
    corpus = fan_out(docs.select("doc_id", "text").unionByName(near))
    # eager checkpoint, not cache(): the a/b self-join below scans this
    # frame from both sides in concurrently-running stages, so a cached
    # frame computes the shingle explode twice (same double-compute as
    # ext_dedup_minhash's shingle frame; see that key for the local-mode
    # portability note)
    sh = _shingles(corpus).localCheckpoint(eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= 0.6)
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
    )


def _duck_minhash_oracle() -> str:
    """Full DuckDB value oracle for the xxhash64 MinHash key (round 10 —
    upgraded from rows-only): the hash family itself is replayed bit-for-
    bit by functions/xxhash_sql.py (seed_i = Spark's hashInt(i, 42) as a
    plan-time constant; band signatures = the chained hashLong fold).
    Hashing runs once per DISTINCT shingle; min() over the SIGNED value
    mirrors Spark's array_min over longs.  Valid below
    ``_MINHASH_SCALE_DOCS`` — the same sub-gate-family contract as every
    engine-gated key (the word-triple scale family is explicitly a
    different hash family, warned at the gate)."""
    from flink_cdc_connectors_spark.functions.xxhash_sql import (
        duck_utf8_bytes_sql,
        duck_xxh64_family_staged_ctes,
        duck_xxh64_long_sql,
        spark_seed_for_int,
        to_signed_sql,
        to_unsigned_sql,
    )

    # ONE staged hash PIPELINE with the 17 family members as parallel
    # COLUMNS. Three measured DuckDB cost cliffs shaped this: (a) 17
    # inlined copies of the single-expression hash cost ~83 s of BINDER
    # time alone; (b) the single-expression form executes through
    # per-row lambda interpretation at ~100 us/hash (~30 s for the
    # family); (c) the seed-CROSS-JOIN staged form still paid ~8 s of
    # per-stage row materialization over 280k seed-crossed rows — the
    # wide form (duck_xxh64_family_staged_ctes) threads 16.5k shingle
    # rows with 17 flat expressions per stage. h_p = the plain
    # xxhash64(s) (seed 42), h_0..h_15 = members (hashInt(i, 42) seeds).
    seeds = [(-1, 42)] + [(i, spark_seed_for_int(i)) for i in range(16)]
    hash_ctes = duck_xxh64_family_staged_ctes("db2", seeds, "hw")

    def band_sig(bi: int) -> str:
        expr = "42::UBIGINT"
        for r in range(4):
            expr = duck_xxh64_long_sql(to_unsigned_sql(f"mh{bi * 4 + r}"), expr)
        return to_signed_sql(expr)

    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {bi} AS band_id, {band_sig(bi)} AS band_sig FROM sig"
        for bi in range(4)
    )
    return f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {_COPY_OFFSET},
             array_to_string(string_split_regex(trim(text), '\\s+')[1:-3], ' ')
      FROM documents
      WHERE len(string_split_regex(trim(text), '\\s+')) > 12
    ),
    shingled AS MATERIALIZED ({_SHINGLE_SQL}),
    dist AS (SELECT DISTINCT shingle FROM shingled),
    db2 AS (SELECT shingle, b, len(b) AS n
            FROM (SELECT shingle, {duck_utf8_bytes_sql('shingle')} AS b FROM dist)),
    {hash_ctes},
    hashed AS MATERIALIZED (
      SELECT shingle, h_p AS h, {", ".join(f"h_{i} AS m{i}" for i in range(16))}
      FROM hw),
    sh AS MATERIALIZED (
      SELECT s.doc_id, h.h, {", ".join(f"h.m{i}" for i in range(16))}
      FROM shingled s JOIN hashed h USING (shingle)),
    sig AS (SELECT doc_id, {", ".join(f"min(m{i}) AS mh{i}" for i in range(16))}
            FROM sh GROUP BY doc_id),
    bands AS MATERIALIZED ({band_rows}),
    cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
             FROM bands x JOIN bands y
               ON x.band_id = y.band_id AND x.band_sig = y.band_sig
                  AND x.doc_id < y.doc_id),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh
              FROM shingled GROUP BY 1),
    common AS (
      SELECT c.id_a, c.id_b, CAST(count(DISTINCT a.h) AS BIGINT) AS n_common
      FROM cand c
      JOIN sh a ON a.doc_id = c.id_a
      JOIN sh b2 ON b2.doc_id = c.id_b AND b2.h = a.h
      GROUP BY 1, 2),
    jacd AS (
      SELECT id_a, id_b,
             CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jac
      FROM common JOIN sizes sa ON sa.doc_id = id_a
                  JOIN sizes sb ON sb.doc_id = id_b)
    SELECT id_a, id_b, round(jac, 4) AS jaccard FROM jacd WHERE jac >= 0.6
    """


# oracle_max_docs (ADVICE r10): past _MINHASH_SCALE_DOCS the builder
# switches to the word-triple hash family, whose band candidates differ
# from the string-shingle family the oracle replays — a harness comparing
# the value oracle above the gate must skip/flag, not report a mismatch.
@query(
    "ext_dedup_minhash",
    tier="C",
    oracle=_duck_minhash_oracle(),
    oracle_max_docs=_MINHASH_SCALE_DOCS,
)
def ext_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates (HASH-CHECKED since round 10 —
    functions/xxhash_sql.py replays Spark's xxhash64 bit-for-bit in DuckDB,
    retiring the round-3 "not SQL-oracle-expressible" pin): 16
    xxhash64-derived min-hashes per doc over 3-gram shingles, banded 4x4;
    docs sharing a band signature become candidate pairs, verified by
    exact Jaccard >= 0.6.

    This is the 100 TB path for ``ext_dedup_ngram_jaccard``: the only wide
    join is on (band_id, band_signature) — bounded bucket sizes — instead of
    a raw shingle self-join. All hashing is xxhash64 (JVM-native, ~10x
    cheaper than md5) and deterministic (no RNG), so the result is stable
    across runs, executors, and retries. Runs on the FULL documents table —
    the band join is the only wide operation at any corpus size."""
    from flink_cdc_connectors_spark.functions import text as T

    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    near = docs.filter(F.size(words) > 12).select(
        (F.col("doc_id") + _COPY_OFFSET).alias("doc_id"),
        F.array_join(F.slice(words, 1, F.size(words) - 2), " ").alias("text"),
    )
    corpus = fan_out(docs.select("doc_id", "text").unionByName(near))
    # Signature is a pure PROJECTION: min over the doc's shingle array per
    # hash-family member (functions/text.py::minhash_signature) — no
    # explode, no groupBy, zero shuffle until the band join.
    # Eager localCheckpoint, not cache(): the band self-join below scans
    # this frame from BOTH sides in concurrently-running stages, and cache
    # blocks aren't published until a partition finishes — so a cached
    # frame pays the regex-split + 3-gram assembly TWICE per run (profiled
    # at sf1: 16.9 s of 22.6 s total was the double shingle build). The
    # eager checkpoint materializes exactly one scan up front; the band
    # join and Jaccard verify then both read checkpoint blocks.
    # (local-mode note: checkpoint blocks are not rebuildable on executor
    # loss — the right trade for this single-JVM harness; on a cluster
    # with dynamic allocation use reliable checkpoint/cache instead.)
    #
    # What the checkpoint STORES is one 100x lever: the signature columns
    # and the shingle sets as HASHES (array<long>, ~8 bytes/shingle), not
    # the string shingles (~60 bytes each) — string shingle arrays at the
    # 100x corpus are ~2 GB of checkpoint blocks the verify join would
    # shuffle twice (GCLocker thrash, profiled). Jaccard on hashed sets
    # equals Jaccard on string sets except under a 64-bit xxhash collision
    # INSIDE one pair's sets (P ~ 60^2/2^65 per pair — no driver-fixture
    # hash can move).
    #
    # What the checkpoint COMPUTES is the other, bigger lever: assembling
    # the shingle STRINGS (slice + array_join per position) is ~75% of
    # the whole query at the 100x corpus (59 s of 80 s profiled; the 16
    # hash passes add only ~20 s on top). Hashing the word TRIPLE
    # directly — xxhash64(w[i], w[i+1], w[i+2]) — skips the string
    # allocation entirely and is ~10x cheaper (6.5 s), but it is a
    # DIFFERENT hash family, so band candidates (and thus the ~95%-recall
    # output) differ slightly. Same resolution as the SRP plane count in
    # ``ext_dedup_embedding_lsh``: the string family is PINNED at driver
    # fixture scales (bit-identical results), and corpora past the scale
    # threshold switch to the triple family with a warning — at 100 TB
    # nobody re-materializes 3-gram strings just to hash them.
    n_docs = docs.count()  # bounded driver scalar: picks the family
    if n_docs <= _MINHASH_SCALE_DOCS:
        shingled = corpus.select(
            "doc_id", T.shingles(T.words_sql("text")).alias("sh")
        )
        sh_arr = shingled.select(
            "doc_id",
            F.transform(F.col("sh"), lambda s: F.xxhash64(s)).alias("hsh"),
            *T.minhash_signature("sh", 16),
        ).localCheckpoint(eager=True)
    else:
        import warnings

        warnings.warn(
            f"ext_dedup_minhash scale mode: word-triple hash family for "
            f"{n_docs} docs — candidate recall differs from the pinned "
            f"string-shingle family below {_MINHASH_SCALE_DOCS} docs"
        )
        w = T.words(F.col("text"))
        wordsed = corpus.select("doc_id", w.alias("w"))
        pos = F.when(
            F.size("w") >= 3, F.sequence(F.lit(1), F.size("w") - 2)
        ).otherwise(F.array().cast("array<int>"))
        h3 = F.array_distinct(
            F.transform(
                pos,
                lambda i: F.xxhash64(
                    F.element_at(F.col("w"), i),
                    F.element_at(F.col("w"), i + 1),
                    F.element_at(F.col("w"), i + 2),
                ),
            )
        )
        hashed = wordsed.select("doc_id", h3.alias("hsh"))
        # single-arity lambda factory — a `lambda h, i=i:` closure would
        # bind i to the ELEMENT INDEX via transform's index-aware form
        # (the arity trap documented at functions/text.py::_salted_xxhash64)
        sh_arr = hashed.select(
            "doc_id",
            "hsh",
            *[
                F.array_min(
                    F.transform(F.col("hsh"), T._salted_xxhash64(i))
                ).alias(f"mh{i}")
                for i in range(16)
            ],
        ).localCheckpoint(eager=True)
    sig = sh_arr
    # LSH: 4 bands of 4 rows; band signature = xxhash64 of the band minhashes
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(*[F.col(f"mh{b * 4 + r}") for r in range(4)])
                    for b in range(4)
                ]
            )
        ).alias("band_id", "band_sig"),
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
    )
    # verify candidates with exact Jaccard — set algebra on the shingle
    # ARRAYS of just the candidate pairs (broadcast-joined twice), no
    # corpus-wide shingle explode at all
    sa = sh_arr.select(F.col("doc_id").alias("id_a"), F.col("hsh").alias("sh_a"))
    sb = sh_arr.select(F.col("doc_id").alias("id_b"), F.col("hsh").alias("sh_b"))
    joined = cand.join(sa, "id_a").join(sb, "id_b")
    n_common = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = n_common / (F.size("sh_a") + F.size("sh_b") - n_common)
    return (
        joined.filter(jac >= 0.6)
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
    )


def _duck_simhash_oracle() -> str:
    """Full DuckDB value oracle for the xxhash64 SimHash key (round 10 —
    upgraded from rows-only, same replay machinery as
    ``_duck_minhash_oracle``): hash each DISTINCT normalized token once
    through the staged xxhash64 pipeline (single seed 42), rebuild the
    64-bit majority-vote fingerprint with per-bit conditional sums
    (strict ``2*ones > n`` — simhash_df's rule), extract the four 16-bit
    bands arithmetically (identical to Spark's arithmetic-shift-and-mask
    on the signed long), and verify band-colliding pairs by
    ``bit_count(xor)`` Hamming distance <= 3."""
    from flink_cdc_connectors_spark.functions.xxhash_sql import (
        duck_utf8_bytes_sql,
        duck_xxh64_family_staged_ctes,
        to_unsigned_sql,
    )

    hash_ctes = duck_xxh64_family_staged_ctes("db2", [(0, 42)], "hw")
    ones = ",\n             ".join(
        f"CAST(sum((hu // {1 << bb}) % 2) AS BIGINT) AS o{bb}" for bb in range(64)
    )
    sig_terms = " + ".join(
        f"(CASE WHEN 2*o{bb} > n_tok THEN {1 << bb}::HUGEINT ELSE 0::HUGEINT END)"
        for bb in range(64)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, sig_u, {bb} AS band_id, "
        f"((sig_u // {1 << (16 * bb)}) % 65536)::BIGINT AS band_val FROM sigs"
        for bb in range(4)
    )
    return f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {_COPY_OFFSET},
             array_to_string(string_split_regex(trim(text), '\\s+')[1:-2], ' ')
      FROM documents
      WHERE len(string_split_regex(trim(text), '\\s+')) > 12
    ),
    tok AS MATERIALIZED (
      SELECT doc_id,
             unnest(string_split_regex({_NORM_SQL.format(c="text")}, '\\s+')) AS shingle
      FROM corpus),
    dist AS (SELECT DISTINCT shingle FROM tok),
    db2 AS (SELECT shingle, b, len(b) AS n
            FROM (SELECT shingle, {duck_utf8_bytes_sql('shingle')} AS b FROM dist)),
    {hash_ctes},
    wh AS MATERIALIZED (
      SELECT shingle, {to_unsigned_sql('h_0')} AS hu FROM hw),
    agg AS (
      SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
             {ones}
      FROM tok t JOIN wh USING (shingle) GROUP BY t.doc_id),
    sigs AS (SELECT doc_id, ({sig_terms})::UBIGINT AS sig_u FROM agg),
    bands AS ({band_rows}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(bit_count(xor(a.sig_u, b.sig_u)) AS INT) AS hamming
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_val = b.band_val
           AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.sig_u, b.sig_u)) <= 3)
    SELECT id_a, id_b, hamming FROM cand
    """


@query("ext_dedup_simhash", tier="C", oracle=_duck_simhash_oracle())
def ext_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup detection (HASH-CHECKED since round 10 — the
    xxhash64 token hash is replayed in DuckDB by functions/xxhash_sql.py):
    64-bit Charikar fingerprint per document
    (functions/text.py::simhash — one JVM-side pass over the token array),
    candidate pairs via 4x16-bit band collisions, confirmed by Hamming
    distance <= 3 (Manku et al., WWW'07). The band structure makes recall
    EXACT at this threshold: 3 flipped bits cannot touch all 4 bands, so
    every qualifying pair collides in at least one band (pigeonhole).

    Scale: the only join is on (band_id, band_value) — each doc appears in
    exactly 4 buckets, bucket sizes are bounded in real corpora, and the
    fingerprint (8 bytes) is the shuffle payload, not the text. Planted
    near-copies (last word dropped) make the check self-validating. Runs on
    the FULL documents table."""
    from flink_cdc_connectors_spark.functions import text as T

    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    near = docs.filter(F.size(words) > 12).select(
        (F.col("doc_id") + _COPY_OFFSET).alias("doc_id"),
        F.array_join(F.slice(words, 1, F.size(words) - 1), " ").alias("text"),
    )
    corpus = fan_out(docs.select("doc_id", "text").unionByName(near))
    # Corpus-scale fingerprint path: explode -> codegen'd per-bit SUM
    # aggregates (functions/text.py::simhash_df) instead of the interpreted
    # HOF fold — same 64-bit output, ~10x cheaper per token. Eagerly
    # checkpointed (not cached) because the band self-join below scans the
    # fingerprints from both sides in concurrent stages — with cache() the
    # tokenize+explode+64-bit vote runs twice before any block publishes
    # (same double-compute as ext_dedup_minhash's shingle frame).
    fp = T.simhash_df(corpus, "doc_id", T.words("text")).localCheckpoint(eager=True)
    # 4 bands of 16 bits each: band_value = bits [16b, 16b+16)
    bands = fp.select(
        "doc_id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sig"), 16 * b).bitwiseAND(F.lit(0xFFFF))
                    for b in range(4)
                ]
            )
        ).alias("band_id", "band_val"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            T.hamming64(F.col("a.sig"), F.col("b.sig")).cast("int").alias("hamming"),
        )
        # Hamming filter BEFORE distinct: random 16-bit band collisions
        # produce ~100x more candidates than true near-dups, so dedup'ing
        # the survivors shuffles hundreds of rows instead of ~1M.
        .filter(F.col("hamming") <= 3)
        .distinct()
    )
    return cand.select("id_a", "id_b", "hamming")


# --- similarity search ------------------------------------------------------

# ANN serving query batch: vec_id % 100 == 0 AND vec_id < _QUERY_ID_CAP.
# The cap pins the BATCH SIZE independent of corpus size — the serving
# shape (a bounded query batch against a growing index). Without it the
# query count grows linearly with the corpus and every sim-search key is
# quadratic by construction (the 100x corpus ladder measured ivf/pq at
# ~30x per decade before the cap). No-op at the driver fixtures (max
# vec_id there is 1999); only synthetic scale fixtures exceed it.
_QUERY_ID_CAP = 2000

# Corpus gate for the exact-scan GEMM engine (ext_sim_search_cosine scale
# mode): below it the broadcast join + HOF cosine runs (the form the
# DuckDB oracle replays); past it each corpus Arrow batch scores as one
# numpy matmul. Same 50k line as the PQ gate; sf0.1 = 2k corpus rows.
_COSINE_GEMM_MIN_ROWS = 50_000


@query(
    "ext_sim_search_cosine",
    tier="C",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < {_QUERY_ID_CAP}
    ),
    scored AS (
      SELECT q.q_id, e.vec_id,
             round(list_dot_product(q.qv, CAST(e.embedding AS DOUBLE[]))
                   / (sqrt(list_dot_product(q.qv, q.qv))
                      * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))), 6) AS sim
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id <> q.q_id
    )
    SELECT q_id, vec_id, sim, CAST(rn AS INT) AS rn
    FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
          FROM scored)
    WHERE rn <= 10
    """,
)
def ext_sim_search_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 per query vector (queries = vec_id % 100 = 0).

    The query side is tiny and explicitly broadcast, so the 'cross join' is
    a broadcast nested loop over the big side — embarrassingly parallel, no
    shuffle of the corpus; the per-query top-k is a windowed rank over
    (query, corpus-partition) partial results. Dot products run JVM-side via
    higher-order array functions (zip_with/aggregate), which Spark 4
    evaluates efficiently — MEASURED faster than an unrolled element_at
    sum, which pays per-access bounds/null checks (2M-pair A/B: 0.8s HOF
    vs 5.4s unrolled). The LSH-bucketed scale path is ``ext_sim_search_lsh``.

    SCALE MODE (round 9): past ``_COSINE_GEMM_MIN_ROWS`` the exact scan
    scores each corpus Arrow batch as ONE numpy matmul against the query
    matrix (mapInPandas, map-only; per-batch top-10 partials compose
    under the same (-sim, vec_id) order through the final q_id window,
    which ranks <= 10 x n_batches rows/query instead of the full corpus).
    The query batch is COLLECTED to the driver first — bounded at <= 20
    vectors at every scale by the ``_QUERY_ID_CAP`` serving contract (a
    query batch is request input, not data: this is the ANN family's one
    collect and it is contract-bounded, never corpus-proportional). A/B
    pinned in tests/test_plan_audits.py::test_cosine_gemm_matches_join_form."""
    from flink_cdc_connectors_spark.functions import vectors as V

    emb = load_table(spark, sf_dir, "embeddings")
    n_corpus = emb.count()  # footer-read scalar gating the engine
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = fan_out(emb.select("vec_id", v.alias("v")))
    queries = base.filter(
        (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < _QUERY_ID_CAP)
    ).select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"))
    if n_corpus < _COSINE_GEMM_MIN_ROWS:
        pairs = base.join(F.broadcast(queries), F.col("vec_id") != F.col("q_id"))
        scored = pairs.select(
            "q_id",
            "vec_id",
            F.round(V.cosine_sim("qv", "v"), 6).alias("sim"),
        )
        w = W.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
        return scored.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= 10
        )

    import numpy as np

    qrows = queries.collect()  # <= 20 rows by the _QUERY_ID_CAP contract
    q_ids = np.array([r.q_id for r in qrows], dtype=np.int64)
    qmat = np.stack([np.asarray(r.qv, dtype=np.float64) for r in qrows])
    qnrm = np.linalg.norm(qmat, axis=1)

    def topk(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy()
            mat = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            nrm = np.linalg.norm(mat, axis=1)
            sims = _rhu6(
                (mat @ qmat.T) / (nrm[:, None] * qnrm[None, :])
            )  # (n, nq); HALF_UP == the join form's F.round (see note below)
            out = []
            for qi in range(len(q_ids)):
                mask = ids != q_ids[qi]
                cids, s = ids[mask], sims[mask, qi]
                sel = np.lexsort((cids, -s))[:10]
                out.append(
                    pd.DataFrame(
                        {
                            "q_id": np.full(len(sel), q_ids[qi], dtype=np.int64),
                            "vec_id": cids[sel],
                            "sim": s[sel],
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    partial = base.mapInPandas(topk, "q_id long, vec_id long, sim double")
    w = W.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return partial.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 10)


# Shared note for every GEMM scale path — RESOLVED in round 11 (VERDICT
# r10 #5): the rounding-MODE divergence is closed.  Every numpy scale path
# now rounds with vectors.round_half_up6, an exact emulation of Spark's
# F.round(x, 6) (BigDecimal HALF_UP over the double's shortest decimal
# repr — vectorized half-away-from-zero plus a decimal.Decimal fix-up for
# the rare elements whose shortest repr sits ON a half-boundary);
# boundary-exact parity vs Spark is pinned in
# tests/test_functions.py::test_round_half_up6_matches_spark_round.
# The one RESIDUAL cross-gate term is accumulation ORDER: the GEMM dot
# sums in a different order than the sequential HOF fold, so the
# pre-rounding doubles themselves can differ in the last ulp, and a sim
# within ~1 ulp of a 6-decimal boundary can still round differently
# across the gate.  The A/B "identical rows" pins are therefore EMPIRICAL
# statements about the driver fixtures (where they hold bit-for-bit);
# order-independent strict parity would require exact (fsum/Kahan)
# accumulation on both engines, which neither exposes.  Greppable anchor:
# GEMM-ROUNDING-NOTE (cited by the scale-mode docstrings in tier_c /
# tier_c_ext3 / tier_c_ext4).


def _srp_sig_batch(df: DataFrame, vec_col: str, planes: int) -> DataFrame:
    """All of ``df``'s columns + the ``planes``-bit SRP ``bucket`` string,
    computed as ONE numpy matmul per Arrow batch (mapInPandas, map-only).

    The Column form (``srp_bucket``) evaluates one interpreted HOF dot per
    plane per row — profiled ~1.3-2.6 s of the 400k-row sf10
    embedding-LSH run (the same interpreted-encode term the PQ/SemDeDup
    fixes removed). Bit-identical to the Column form: same ``srp{i}``
    coefficient family, same dot-sign >= 0 rule (helper-level A/B pinned
    in tests/test_plan_audits.py::test_srp_batch_sig_matches_hof).
    SCALE-MODE ONLY: oracle scales keep ``srp_bucket`` so the DuckDB
    replay stays plan-for-plan what the driver has always hash-proven."""
    from pyspark.sql import types as T2

    from flink_cdc_connectors_spark.functions import vectors as V

    P = V.srp_planes_np(planes)
    out_schema = T2.StructType(
        list(df.schema.fields) + [T2.StructField("bucket", T2.StringType())]
    )

    def enc(batches):
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            d = mat.shape[1]
            signs = (mat @ P[:, :d].T) >= 0  # (n, planes)
            chars = np.where(signs, "1", "0")
            pdf = pdf.copy()
            pdf["bucket"] = ["".join(r) for r in chars]
            yield pdf

    return df.mapInPandas(enc, out_schema)


def _duck_sim_lsh_oracle() -> str:
    from flink_cdc_connectors_spark.functions.vectors import duck_srp_bucket_sql

    # adaptive plane count (see the builder): prefix of the 16-plane sign
    # string, length least(16, greatest(8, ceil(log2(n/100))))
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    lp AS (SELECT least(16, greatest(8,
                   CAST(ceil(log2(count(*) / 50.0)) AS INT))) AS l
           FROM embeddings),
    sig AS (SELECT vec_id, e,
                   substr({duck_srp_bucket_sql('e', 16)}, 1, lp.l) AS bucket
            FROM v, lp),
    cand AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_dot_product(a.e, b.e)
                   / (sqrt(list_dot_product(a.e, a.e))
                      * sqrt(list_dot_product(b.e, b.e))), 6) AS sim
      FROM sig a JOIN sig b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
    SELECT id_a, id_b, sim, CAST(rn AS INT) AS rn
    FROM (SELECT *, row_number() OVER (PARTITION BY id_a ORDER BY sim DESC, id_b) AS rn
          FROM cand)
    WHERE rn <= 5
    """


@query("ext_sim_search_lsh", tier="C", oracle=_duck_sim_lsh_oracle())
def ext_sim_search_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed ANN: sign-random-projection LSH. Each vector is bucketed by
    the sign pattern of deterministic pseudo-random hyperplanes
    (hash-derived coefficients, no RNG state); candidates are same-bucket
    pairs, exact cosine re-ranks within the bucket.

    The plane count ADAPTS to the corpus: L = clamp(8, 16,
    ceil(log2(n/50))) sign bits, so the expected bucket size stays
    ~constant (~50) and the within-bucket all-pairs stage stays LINEAR
    in n instead of quadratic — with 8 fixed planes the 100x corpus
    ladder measured a 137x blowup (pairs grow n^2/256); with the
    adaptive prefix it is the bucket-size-constant form real SRP-LSH
    deploys. (Calibration tightened 100 -> 50 in round 6, the same
    occupancy-halving that flattened ext_dedup_embedding_lsh: the
    within-bucket pair re-rank is the scale-dominant term.) Both
    engines derive L from the same count, and the first 8 of the 16
    planes are the original family, so driver fixtures
    (n <= 2000 -> L = 8) are bit-identical to the fixed form.

    At 100 TB this replaces the brute-force scan: the corpus shuffles once
    on the bucket key, each bucket is small, and the exact re-rank touches
    only same-bucket candidates. Recall tunes with #planes/#tables.

    HASH-CHECKED against DuckDB (upgraded from rows-only in round 3): the
    hyperplanes are plan-time literals shared with the oracle SQL, which
    replays bucketing, candidate join, and windowed re-rank verbatim."""
    import math

    from flink_cdc_connectors_spark.functions import vectors as V

    emb = load_table(spark, sf_dir, "embeddings")
    # bounded driver scalar: the corpus count sizes the plane family
    n = emb.count()
    lplanes = min(16, max(8, math.ceil(math.log2(max(n, 2) / 50.0))))
    base = fan_out(emb.select("vec_id", V.as_double("embedding").alias("v")))
    # Hyperplane coefficients are plan-time literal arrays
    # (functions/vectors.py::srp_bucket) — one dot product per plane per
    # row, no per-row hashing.
    # Compute ONLY the prefix planes (bit-identical to substring of the
    # 16-plane string — plane i is salt-indexed srp{i} either way) so the
    # corpus-side projection does lplanes dots/row, not 16. Each mode
    # builds exactly one sig plan (ADVICE r9: the Column form was built
    # unconditionally and discarded in scale mode).
    if lplanes == 8:
        # driver scales: the self-join + windowed re-rank both engines
        # replay verbatim (bit-identical hash)
        sig = base.select(
            "vec_id",
            "v",
            V.srp_bucket("v", num_planes=lplanes).alias("bucket"),
        )
        a, b = sig.alias("a"), sig.alias("b")
        cand = a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        ).select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(V.cosine_sim("a.v", "b.v"), 6).alias("sim"),
        )
        w = W.partitionBy("id_a").orderBy(F.desc("sim"), F.asc("id_b"))
        return cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)
    # SCALE MODE: one GEMM + top-5 per BUCKET (the embedding_lsh pattern).
    # The join form pays an interpreted HOF cosine (three array folds) per
    # candidate pair plus a window sort over all pairs; here each bucket
    # scores as one numpy matmul and, because a vector lives in exactly
    # ONE bucket, the per-id_a top-5 is complete within the bucket — the
    # whole key becomes a single exchange on the bucket key. Rounding and
    # tie-breaks mirror the join form (round 6 BEFORE ranking,
    # (-sim, id_b) order); A/B at sf0.1 (9 planes): identical rows —
    # empirically; rounding mode matches F.round exactly since round 11
    # (round_half_up6), residual accumulation-order term: GEMM-ROUNDING-NOTE.
    # Round 9: the bucket-assign itself also moves to a batched matmul
    # (_srp_sig_batch) — the per-plane interpreted HOF dot was the same
    # encode term the PQ fix removed.
    sig = _srp_sig_batch(base.select("vec_id", "v"), "v", lplanes)
    import pandas as pd  # noqa: F401  (closure below pickles by value)

    def _topk_factory(k_top: int):
        def topk(pdf):
            import numpy as np
            import pandas as _pd

            ids = pdf["vec_id"].to_numpy()
            order = np.argsort(ids)
            ids = ids[order]
            mat = np.stack(pdf["v"].to_numpy()[order]).astype(np.float64)
            nrm = np.linalg.norm(mat, axis=1, keepdims=True)
            sims = _rhu6((mat @ mat.T) / (nrm * nrm.T))
            rows_a, rows_b, rows_s, rows_r = [], [], [], []
            m = len(ids)
            for i in range(m - 1):
                s = sims[i, i + 1 :]
                cand_ids = ids[i + 1 :]
                sel = np.lexsort((cand_ids, -s))[:k_top]
                for r, j in enumerate(sel, start=1):
                    rows_a.append(ids[i])
                    rows_b.append(cand_ids[j])
                    rows_s.append(s[j])
                    rows_r.append(r)
            return _pd.DataFrame(
                {"id_a": rows_a, "id_b": rows_b, "sim": rows_s, "rn": rows_r}
            )

        return topk

    return sig.groupBy("bucket").applyInPandas(
        _topk_factory(5), "id_a long, id_b long, sim double, rn int"
    )


def _duck_sim_ivf_oracle() -> str:
    from flink_cdc_connectors_spark.functions.vectors import (
        duck_ivf_cell_sql,
        duck_ivf_probe_structs_sql,
    )

    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    cells AS (SELECT vec_id, e, {duck_ivf_cell_sql('e')} AS cell FROM v),
    q AS (SELECT vec_id AS q_id, e AS qv FROM v WHERE vec_id % 100 = 0 AND vec_id < {_QUERY_ID_CAP}),
    qscore AS (
      SELECT q_id, qv, x.s AS s, x.c AS cell
      FROM (SELECT q_id, qv, unnest({duck_ivf_probe_structs_sql('qv')}) AS x FROM q) t),
    qtop AS (
      SELECT q_id, qv, cell FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY s DESC, cell DESC) AS pr
        FROM qscore) WHERE pr <= 2),
    pairs AS (
      SELECT qt.q_id, c.vec_id,
             round(list_dot_product(qt.qv, c.e)
                   / (sqrt(list_dot_product(qt.qv, qt.qv))
                      * sqrt(list_dot_product(c.e, c.e))), 6) AS sim
      FROM qtop qt JOIN cells c ON c.cell = qt.cell AND c.vec_id <> qt.q_id)
    SELECT q_id, vec_id, sim, CAST(rn AS INT) AS rn
    FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
          FROM pairs)
    WHERE rn <= 10
    """


@query("ext_sim_search_ivf", tier="C", oracle=_duck_sim_ivf_oracle())
def ext_sim_search_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN (hash-checked since round 3 — the literal centroid
    family is shared with the DuckDB oracle, which replays cell assignment,
    top-P probe selection, and the windowed re-rank): vectors are coarse-quantized to the
    hash-derived pseudo-centroid with max dot product
    (functions/vectors.py::ivf_centroid_id); each query probes ONLY its own
    cell and exact cosine re-ranks within it — the inverted-file pruning
    structure of FAISS-IVF without a training pass.

    Scale: the corpus shuffles once on cell id (16 cells here; thousands at
    real scale), queries broadcast to their cells, and the exact re-rank
    touches P*|corpus|/num_cells candidates per query instead of |corpus|.
    Recall tunes with the nprobe knob — each QUERY probes its top-P cells
    (P=2 here; functions/vectors.py::ivf_centroid_topk), the corpus stays
    single-cell. ``ext_ann_recall`` records the measured recall@10 at
    P=1 and P=4 operating points."""
    from flink_cdc_connectors_spark.functions import vectors as V

    emb = load_table(spark, sf_dir, "embeddings")
    base = fan_out(emb.select("vec_id", V.as_double("embedding").alias("v")))
    cells = base.withColumn("cell", V.ivf_centroid_id("v"))
    queries = (
        base.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < _QUERY_ID_CAP))
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            F.explode(V.ivf_centroid_topk("v", probes=2)).alias("cell"),
        )
    )
    pairs = cells.join(F.broadcast(queries), "cell").filter(
        F.col("vec_id") != F.col("q_id")
    )
    scored = pairs.select(
        "q_id",
        "vec_id",
        F.round(V.cosine_sim("qv", "v"), 6).alias("sim"),
    )
    w = W.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 10)


# --- text analysis ----------------------------------------------------------


@query(
    "ext_text_stats",
    tier="C",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT)                                    AS n_docs,
           round(avg(len(string_split_regex(trim(text), '\\s+'))), 4)  AS avg_tokens,
           round(avg(n_chars), 4)                                      AS avg_chars,
           CAST(max(len(string_split_regex(trim(text), '\\s+'))) AS INT) AS max_tokens
    FROM documents
    GROUP BY lang
    """,
)
def ext_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-corpus statistics per language: doc counts, token/char averages.
    Whitespace tokenization stays JVM-side (split + size) — no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(ntok), 4).alias("avg_tokens"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.max(ntok).alias("max_tokens"),
    )


@query(
    "ext_token_count",
    tier="C",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INT)
             AS n_tokens,
           CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))) AS INT)
             AS n_distinct_tokens
    FROM documents
    """,
)
def ext_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: regex pre-tokenizer (letter runs / digit runs
    / single punctuation), total + distinct per document — the token-budget
    accounting a training-data pipeline runs over every shard.

    ENGINE GATE (round 9, VERDICT r8 #5): below the corpus gate the JVM
    ``regexp_extract_all`` form runs (the one the oracle replays); past it
    the same tokenizer runs as a precompiled ``re.findall`` over Arrow
    batches in ``mapInPandas`` — ABAB at the 100x corpus point measured
    the JVM alternation at 5.6-5.8 s vs 1.3-2.5 s for the batch form
    (values identical on the full fixture; the r7 lookaround rewrite of
    the JVM regex itself was 4x WORSE, so the win is engine overhead —
    per-row regex cold-start and array materialization — not the
    pattern). ``re.ASCII`` pins Python's ``\\s`` to the same ASCII class
    Java uses, so the gate cannot flip tokenization on exotic
    whitespace."""
    docs = load_table(spark, sf_dir, "documents")
    if docs.count() <= _MINHASH_SCALE_DOCS:
        toks = F.regexp_extract_all(
            F.lower("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0
        )
        return docs.select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        )

    return docs.select("doc_id", "text").mapInPandas(
        _token_count_batches, "doc_id long, n_tokens int, n_distinct_tokens int"
    )


def _token_count_batches(batches):
    """Arrow-batch tokenizer behind ``ext_token_count``'s engine gate.

    Null text yields NULL counts — the same thing the JVM
    ``regexp_extract_all`` form produces (``size(null)`` is null), so the
    gate cannot turn a null row into a job failure: ``.str.lower()``
    propagates NaN and ``na_action="ignore"`` skips it through both maps;
    the nullable Int32 dtype carries the null to Arrow (ADVICE r9)."""
    import re

    import pandas as pd

    pat = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]", re.ASCII)
    for pdf in batches:
        fl = pdf["text"].str.lower().map(pat.findall, na_action="ignore")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_tokens": fl.map(len, na_action="ignore").astype("Int32"),
                "n_distinct_tokens": fl.map(
                    lambda x: len(set(x)), na_action="ignore"
                ).astype("Int32"),
            }
        )


_STOPWORDS_PAT = r"\b(the|a|an|of|to|and|in|is|it|for)\b"


# The heuristic quality score as a SQL fragment over a `text` column —
# shared by ext_quality_score and the cluster keeper-selection key so the
# two stay the same signal (rounded to 4 so ordering on it is identical
# across engines).
_QUALITY_SQL = f"""round(
             0.4 * least(len(string_split_regex(trim(text), '\\s+')) / 100.0, 1.0)
           + 0.3 * (1.0 - CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
                          / length(text))
           + 0.3 * least(CAST(len(regexp_extract_all(lower(text), '{_STOPWORDS_PAT}')) AS DOUBLE)
                         / len(string_split_regex(trim(text), '\\s+')) * 5.0, 1.0)
           , 4)"""


def quality_col() -> "F.Column":
    """Column twin of _QUALITY_SQL (rounded to 4 decimals)."""
    ntok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    npunct = F.length(F.regexp_replace("text", r"[^.,!?;:]", ""))
    nstop = F.size(F.regexp_extract_all(F.lower("text"), F.lit(_STOPWORDS_PAT), 0))
    score = (
        0.4 * F.least(ntok / 100.0, F.lit(1.0))
        + 0.3 * (1.0 - npunct.cast("double") / F.length("text"))
        + 0.3 * F.least(nstop.cast("double") / ntok * 5.0, F.lit(1.0))
    )
    return F.round(score, 4)


@query(
    "ext_quality_score",
    tier="C",
    oracle=f"""
    SELECT doc_id, {_QUALITY_SQL} AS quality
    FROM documents
    """,
)
def ext_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality score: length saturation + low punctuation
    density + stopword-rate band — the C4/Gopher-style filter family, all in
    JVM expressions."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_col().alias("quality"))


# The marker-word language-ID signal as a SQL fragment over a `text`
# column — shared by ext_lang_id and the curation-pipeline capstone so
# the two stay the same classifier.
_LANG_PRED_SQL = """CASE WHEN len(regexp_extract_all(lower(text), '\\b(the|and|of|is)\\b')) >= 2 THEN 'en'
                WHEN len(regexp_extract_all(lower(text), '\\b(le|la|et|les)\\b')) >= 2 THEN 'fr'
                WHEN len(regexp_extract_all(lower(text), '\\b(der|die|und|das)\\b')) >= 2 THEN 'de'
                WHEN len(regexp_extract_all(lower(text), '\\b(el|los|y|las)\\b')) >= 2 THEN 'es'
                WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
                ELSE 'und' END"""


def lang_pred_col() -> "F.Column":
    """Column twin of _LANG_PRED_SQL."""

    def marks(pat: str):
        return F.size(F.regexp_extract_all(F.lower("text"), F.lit(pat), 0))

    return (
        F.when(marks(r"\b(the|and|of|is)\b") >= 2, "en")
        .when(marks(r"\b(le|la|et|les)\b") >= 2, "fr")
        .when(marks(r"\b(der|die|und|das)\b") >= 2, "de")
        .when(marks(r"\b(el|los|y|las)\b") >= 2, "es")
        .when(F.col("text").rlike(r"[一-鿿]"), "zh")
        .otherwise("und")
    )


@query(
    "ext_lang_id",
    tier="C",
    oracle=f"""
    SELECT doc_id, lang,
           {_LANG_PRED_SQL} AS lang_pred
    FROM documents
    """,
)
def ext_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/stopword-heuristic language ID: marker-word counts per
    language family, CJK by codepoint range — deterministic and
    SQL-expressible (real model scoring would slot in as a Pandas UDF)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", lang_pred_col().alias("lang_pred"))


@query(
    "ext_fingerprint",
    tier="C",
    # oracle_max_docs (ADVICE r10): the oracle replays the sub-gate md5
    # family; past the gate the fingerprint VALUES are the xxhash64
    # family's (see CROSS-SCALE CONTRACT in the docstring), so the value
    # oracle must be skipped/flagged above the gate.
    oracle_max_docs=_MINHASH_SCALE_DOCS,
    oracle=f"""
    WITH corpus AS ({_WITH_COPIES_SQL}),
    words AS (
      SELECT doc_id, string_split_regex({_NORM_SQL.format(c="text")}, '\\s+') AS w
      FROM corpus)
    SELECT doc_id,
           CASE WHEN len(w) >= 4 THEN
             list_aggregate(list_transform(
               generate_series(1, len(w) - 3),
               i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])), 'min')
           ELSE md5(array_to_string(w, ' ')) END AS fingerprint
    FROM words
    """,
)
def ext_fingerprint(
    spark: SparkSession, sf_dir: str, hash_family: str | None = None
) -> DataFrame:
    """Document fingerprint: minimum hash over rolling word 4-grams (a
    one-permutation MinHash). Identical for the planted perturbed copies,
    so fingerprint-equality is a cheap near-dup key at scale. All hashing
    JVM-side; no Python in the row path.

    Scale: below the corpus gate the gram hash is md5 over the joined
    4-gram string — the form the DuckDB oracle replays verbatim. Past
    the gate it is xxhash64 over the word 4-TUPLE (hex-encoded so the
    column type is stable across scales): the slice+array_join string
    assembly was measured as 25.7x at the 100x corpus point — the same
    dominant cost the minhash/substring/curation keys shed with the
    identical switch. Fingerprint values differ across the gate but the
    EQUALITY STRUCTURE is preserved: copies share the full gram set, so
    they share the min under any per-gram hash.

    CROSS-SCALE CONTRACT (ADVICE r8): because the VALUE depends on the
    family, fingerprints persisted from one run must only ever be joined
    against fingerprints of the SAME family. A consumer that stores
    fingerprints across datasets of different sizes pins the family
    explicitly with ``hash_family='md5'`` or ``'xxhash64'`` — the
    corpus-size auto-gate (``hash_family=None``) is a per-run throughput
    heuristic, not part of the output contract."""
    if hash_family not in (None, "md5", "xxhash64"):
        raise ValueError(f"unknown fingerprint hash_family: {hash_family!r}")
    raw = load_table(spark, sf_dir, "documents")
    corpus = _with_copies(raw)
    words = corpus.select("doc_id", F.split(_norm_col(F.col("text")), r"\s+").alias("w"))
    use_md5 = (
        hash_family == "md5"
        if hash_family
        else raw.count() <= _MINHASH_SCALE_DOCS
    )
    if use_md5:
        grams = F.transform(
            F.sequence(F.lit(1), F.size("w") - 3),
            lambda i: F.md5(F.array_join(F.slice("w", i, 4), " ")),
        )
        fp = F.when(F.size("w") >= 4, F.array_min(grams)).otherwise(
            F.md5(F.array_join("w", " "))
        )
    else:
        grams = F.transform(
            F.sequence(F.lit(1), F.size("w") - 3),
            lambda i: F.xxhash64(*[F.element_at(F.col("w"), i + k) for k in range(4)]),
        )
        fp = F.lower(
            F.hex(
                F.when(F.size("w") >= 4, F.array_min(grams)).otherwise(
                    F.xxhash64(F.array_join("w", " "))
                )
            )
        )
    return words.select("doc_id", fp.alias("fingerprint"))


# --- multimodal columns -----------------------------------------------------


@query(
    "ext_multimodal_cols",
    tier="C",
    oracle="""
    SELECT d.doc_id, d.lang, e.label,
           CAST(len(e.embedding) AS INT) AS dim,
           round(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                       CAST(e.embedding AS DOUBLE[]))), 4) AS l2_norm,
           round(list_sum(CAST(e.embedding AS DOUBLE[])), 4) AS comp_sum
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    WHERE list_sum(CAST(e.embedding AS DOUBLE[])) > 0
    """,
)
def ext_multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed multimodal columns: scalar metadata joined with an
    array<float> embedding column, filtered on a vector property computed
    JVM-side with higher-order functions. The fixture vectors are
    unit-normalized, so the filter is on the signed component sum (which
    splits the table) rather than the L2 norm (constant 1.0, which would
    make any norm threshold select all rows or none — the round-1 vacuity)."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    csum = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x)
    joined = docs.join(
        emb.withColumn("l2", norm).withColumn("csum", csum),
        docs.doc_id == emb.vec_id,
    )
    return joined.filter(F.col("csum") > 0).select(
        "doc_id",
        "lang",
        "label",
        F.size("embedding").alias("dim"),
        F.round("l2", 4).alias("l2_norm"),
        F.round("csum", 4).alias("comp_sum"),
    )


@query(
    "ext_multimodal_decode",
    tier="C",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           substring(text, 1, 8)                      AS header,
           CAST(octet_length(encode(text)) % 256 AS BIGINT) AS checksum
    FROM documents
    """,
)
def ext_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary decode plumbing: payloads as a ``binary`` column,
    decoded with an Arrow-batched ``mapInPandas`` (the real image/audio
    decoder would replace the body; libs absent in this container, so the
    'decode' extracts deterministic byte-level features). The Spark-side
    shape — binary column in, typed metadata out, batch iterator — is the
    production path."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))

    def decode(batches):
        # STUB for image/audio decode (PIL/ffmpeg not in container):
        # deterministic byte-level features keep the plumbing testable.
        for pdf in batches:
            out = pdf[["doc_id"]].copy()
            out["n_bytes"] = pdf["payload"].map(len).astype("int64")
            out["header"] = pdf["payload"].map(lambda b: b[:8].decode("utf-8", "replace"))
            out["checksum"] = (out["n_bytes"] % 256).astype("int64")
            yield out

    return fan_out(payloads).mapInPandas(
        decode, schema="doc_id long, n_bytes long, header string, checksum long"
    )


def _emb_corpus_with_copies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL embeddings table plus planted exact copies (vec_id + offset) —
    the self-validating corpus for semantic dedup: every vector's copy is a
    guaranteed cos=1.0 near-dup, on top of whatever natural pairs exist."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select("vec_id", v.alias("e"))
    return fan_out(
        base.unionByName(
            base.select((F.col("vec_id") + _COPY_OFFSET).alias("vec_id"), "e")
        )
    )


@query(
    "ext_dedup_embedding",
    tier="C",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    corpus AS (SELECT vec_id, e FROM v
               UNION ALL
               SELECT vec_id + {_COPY_OFFSET}, e FROM v),
    n AS (SELECT vec_id,
                 list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS ne
          FROM corpus),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_dot_product(a.ne, b.ne), 6) AS cos_sim
      FROM n a JOIN n b ON a.vec_id < b.vec_id)
    SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= 0.5
    """,
)
def ext_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos >= 0.5) over the FULL table —
    the exact all-pairs VERIFIER for semantic dedup (the ground truth the
    bucketed scale path ``ext_dedup_embedding_lsh`` is measured against,
    the same verifier/scale-path split as ngram-Jaccard vs MinHash).

    Executed as a BLOCK MATMUL, not a pair join: a broadcast-nested-loop
    join materializes all O(n^2) pair rows just to dot them one at a time
    (measured 2x the whole query's budget in join machinery alone); here
    each Arrow batch of probe vectors does ONE numpy GEMM against the
    comparison matrix and emits only the thresholded pairs — the sanctioned
    vectorized-Pandas form, and the same blocked layout a cluster GEMM
    would use. The comparison side is collected once into a task broadcast
    (same driver-memory envelope as the F.broadcast the join form shipped);
    exact all-pairs is by design bounded to a verifier-sized set — the
    unbounded path is the LSH candidate generator. The bound is ENFORCED:
    a count guard refuses comparison sides above ``_VERIFIER_MAX_ROWS``
    instead of silently OOM-ing the driver at scale.

    The corpus includes the planted exact copies (vec_id + offset), so the
    verifier's output always contains the n cos=1.0 planted pairs — the
    fixture vectors are unit-normalized with natural max-cos ~0.48, which
    made the raw-table round-1 check vacuous (0 pairs on both engines)."""
    import numpy as np
    import pandas as pd

    base = _emb_corpus_with_copies(spark, sf_dir)

    n_rows = base.count()
    if n_rows > _VERIFIER_MAX_ROWS:
        raise ValueError(
            f"ext_dedup_embedding is the bounded exact verifier: comparison "
            f"side has {n_rows} rows > cap {_VERIFIER_MAX_ROWS}. Use "
            f"ext_dedup_embedding_lsh (bucketed candidates) at this scale."
        )
    b_pdf = base.toPandas()
    b_ids = b_pdf["vec_id"].to_numpy()
    b_mat = np.stack(b_pdf["e"].to_numpy()).astype(np.float64)
    b_mat /= np.linalg.norm(b_mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((b_ids, b_mat))

    def gemm_pairs(batches):
        ids_b, mat_b = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids_a = pdf["vec_id"].to_numpy()
            mat_a = np.stack(pdf["e"].to_numpy()).astype(np.float64)
            mat_a /= np.linalg.norm(mat_a, axis=1, keepdims=True)
            sims = _rhu6(mat_a @ mat_b.T)
            ia, ib = np.nonzero(sims >= 0.5)
            keep = ids_a[ia] < ids_b[ib]
            yield pd.DataFrame(
                {
                    "id_a": ids_a[ia][keep],
                    "id_b": ids_b[ib][keep],
                    "cos_sim": sims[ia, ib][keep],
                }
            )

    # base is already fan_out-partitioned by _emb_corpus_with_copies
    return base.mapInPandas(gemm_pairs, "id_a long, id_b long, cos_sim double")


def _duck_emb_lsh_oracle() -> str:
    from flink_cdc_connectors_spark.functions.vectors import duck_srp_bucket_sql

    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    corpus AS (SELECT vec_id, e FROM v
               UNION ALL
               SELECT vec_id + {_COPY_OFFSET}, e FROM v),
    sig AS (SELECT vec_id, e, {duck_srp_bucket_sql('e')} AS bucket FROM corpus),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_dot_product(a.e, b.e)
                   / (sqrt(list_dot_product(a.e, a.e))
                      * sqrt(list_dot_product(b.e, b.e))), 6) AS cos_sim
      FROM sig a JOIN sig b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
    SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= 0.5
    """


# oracle_max_embeddings (VERDICT r11 #4): the plane formula widens past
# n_corpus = 2*count(embeddings) = 24_000 and the static 8-plane oracle
# stops applying — previously only a runtime warning; now machine-readable
@query(
    "ext_dedup_embedding_lsh",
    tier="C",
    oracle=_duck_emb_lsh_oracle(),
    oracle_max_embeddings=12_000,
)
def ext_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-FED semantic dedup at full table size — the 100 TB path.
    Candidates come from sign-random-projection bucket collisions (one
    shuffle on the bucket key, bounded buckets, 8-byte-ish shuffle
    payloads), then the exact cosine threshold verifies candidates only —
    never all pairs. Planted exact copies land in identical buckets by
    construction, so the planted truth is always recovered; recall on
    weaker pairs is measured by ``ext_ann_recall`` against the exact
    verifier.

    HASH-CHECKED against DuckDB (upgraded from rows-only in round 3): the
    SRP hyperplanes are plan-time literal constants shared with the oracle
    SQL (functions/vectors.py::duck_srp_bucket_sql), so the oracle replays
    the identical bucket assignment and candidate join — the driver's
    value hash covers the whole LSH pipeline.

    SCALE KNOB (found by the 10x probe, scale_probe.py): with a FIXED
    2^8-bucket family, bucket occupancy grows linearly with the corpus and
    same-bucket candidate pairs quadratically — measured 24x runtime at
    10x rows. Bucket count must track corpus size: planes = 8 +
    ceil(log2(n / 24k)) beyond 24k corpus rows keeps expected occupancy
    (and per-bucket pair work) constant, the textbook LSH operating
    point. The calibration constant was tightened 48k -> 24k in round 6:
    the per-pair verify is the scale-dominant term and halving expected
    occupancy halves it, while recall for the planted-copy contract is
    unchanged (exact copies collide at ANY plane count) and the residual
    cos>=0.5 natural-pair collision probability moves only (2/3)^1.
    Pinned to exactly 8 planes at oracle scales (sf<=0.1 corpus <= 30k),
    so the static DuckDB replay stays bit-valid where the driver compares;
    re-probed at sf1: 16.1 s -> ~2 s (see BASELINE.md)."""
    import math

    from flink_cdc_connectors_spark.functions import vectors as V

    base = _emb_corpus_with_copies(spark, sf_dir)
    # corpus rows = 2x the table (planted copies); counting the RAW parquet
    # frame is a metadata-only footer read, not a pipeline execution
    n_corpus = 2 * load_table(spark, sf_dir, "embeddings").count()
    planes = 8 + max(0, math.ceil(math.log2(max(n_corpus, 1) / 24_000)))
    if planes != 8:
        # SCALE MODE: the static DuckDB oracle replays exactly 8 planes —
        # valid at every driver fixture (sf<=0.1, corpus<=30k). Beyond the
        # pin the oracle must not be compared; make the assumption loud
        # instead of letting a hash mismatch read as a dedup bug.
        import warnings

        warnings.warn(
            f"ext_dedup_embedding_lsh scale mode: {planes} planes for "
            f"{n_corpus} corpus rows — the 8-plane static oracle does not "
            "apply at this scale",
            stacklevel=2,
        )
    # Norms are computed ONCE PER ROW before the join: the candidate-side
    # cosine is then a single dot + one multiply instead of three array
    # folds per pair — per-pair verify cost is the scale-determining term
    # (pairs >> rows), measured ~3x on the sf1 probe.
    # Deliberately NOT localCheckpoint'd like ext_dedup_minhash's shingle
    # frame: the double-compute it would save (scan + cast + norm + SRP,
    # all vectorized arithmetic) is cheap, while materializing 64-double
    # arrays for the full corpus is ~0.5 GB/M rows of heap — measured
    # NET-SLOWER at the 100x ladder point (29.5 s -> 43.7 s) and an OOM
    # risk in small-heap sessions.
    if planes == 8:
        # oracle scales: the self-join + HOF-dot verify the DuckDB SQL
        # replays verbatim (bit-valid value hash)
        sig = base.select(
            "vec_id",
            "e",
            V.l2_norm("e").alias("nrm"),
            V.srp_bucket("e", num_planes=planes).alias("bucket"),
        )
        a, b = sig.alias("a"), sig.alias("b")
        cand = a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        ).select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(
                V.dot("a.e", "b.e") / (F.col("a.nrm") * F.col("b.nrm")),
                6,
            ).alias("cos_sim"),
        )
        return cand.filter(F.col("cos_sim") >= 0.5)
    # SCALE MODE verify: one GEMM per BUCKET (applyInPandas — buckets are
    # already groups) instead of the bucket self-join with a per-pair
    # higher-order dot. HOF lambdas evaluate interpreted, so the join form
    # pays ~dim interpreted steps per candidate pair — the SemDeDup fix's
    # finding, applied to the sibling: same shuffle count (one exchange on
    # the bucket key vs the join's two), pairs never materialize through
    # an exchange, and the within-bucket pair scoring is one numpy matmul.
    # Occupancy calibration bounds the per-bucket matrix; A/B against the
    # join form at sf1: identical pair sets, max |cos| delta < 1e-6
    # (empirical fixture pin — rounding mode matches F.round since round 11;
    # the residual GEMM-ROUNDING-NOTE accumulation-order term applies at
    # the 0.5 threshold for sims within ~1 ulp of a 6-decimal boundary).
    # Round 9: bucket-assign via one matmul per Arrow batch instead of
    # the per-plane interpreted HOF dot (see _srp_sig_batch) — bit-equal
    # buckets, helper-level A/B pinned.
    sig = _srp_sig_batch(base.select("vec_id", "e"), "e", planes)

    def _verify_factory(threshold: float):
        def verify(pdf):
            import numpy as np
            import pandas as pd

            ids = pdf["vec_id"].to_numpy()
            order = np.argsort(ids)
            ids = ids[order]
            mat = np.stack(pdf["e"].to_numpy()[order]).astype(np.float64)
            nrm = np.linalg.norm(mat, axis=1, keepdims=True)
            sims = _rhu6((mat @ mat.T) / (nrm * nrm.T))
            ia, ib = np.triu_indices(len(ids), k=1)
            keep = sims[ia, ib] >= threshold
            return pd.DataFrame(
                {
                    "id_a": ids[ia[keep]],
                    "id_b": ids[ib[keep]],
                    "cos_sim": sims[ia[keep], ib[keep]],
                }
            )

        return verify

    return sig.groupBy("bucket").applyInPandas(
        _verify_factory(0.5), "id_a long, id_b long, cos_sim double"
    )


def _duck_ann_recall_oracle() -> str:
    from flink_cdc_connectors_spark.functions.vectors import (
        duck_ivf_cell_sql,
        duck_ivf_probe_structs_sql,
        duck_pq_adc_sql,
        duck_pq_codes_sql,
        duck_srp_bucket_sql,
        duck_srp_table_bucket_sqls,
    )

    cos = (
        "round(list_dot_product({q}, {c}) / (sqrt(list_dot_product({q}, {q}))"
        " * sqrt(list_dot_product({c}, {c}))), 6)"
    )
    tables = ",".join(duck_srp_table_bucket_sqls("e"))

    def top10(scored: str) -> str:
        return f"""SELECT q_id, vec_id FROM (
          SELECT q_id, vec_id, row_number() OVER (
            PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn FROM ({scored}))
        WHERE rn <= 10"""

    def probe(p: int) -> str:
        return f"""SELECT q_id, qv, cell FROM (
          SELECT q_id, qv, x.c AS cell, row_number() OVER (
            PARTITION BY q_id ORDER BY x.s DESC, x.c DESC) AS pr
          FROM (SELECT q_id, qv, unnest({duck_ivf_probe_structs_sql('qv')}) AS x
                FROM q) t) WHERE pr <= {p}"""

    def row(name: str, approx_cte: str) -> str:
        return f"""
        SELECT '{name}' AS method,
               (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_truth,
               (SELECT CAST(count(*) AS BIGINT)
                FROM exact JOIN {approx_cte} USING (q_id, vec_id)) AS n_hits,
               round((SELECT count(*) FROM exact JOIN {approx_cte} USING (q_id, vec_id))
                     / (SELECT count(*)::DOUBLE FROM exact), 4) AS recall_at_10"""

    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    corpus AS (SELECT vec_id, e FROM v
               UNION ALL SELECT vec_id + {_COPY_OFFSET}, e FROM v),
    q AS (SELECT vec_id AS q_id, e AS qv FROM v WHERE vec_id % 100 = 0 AND vec_id < {_QUERY_ID_CAP}),
    exact AS ({top10(f'''
      SELECT q.q_id, c.vec_id, {cos.format(q='q.qv', c='c.e')} AS sim
      FROM q JOIN corpus c ON c.vec_id <> q.q_id''')}),
    sigb AS (SELECT vec_id, e, {duck_srp_bucket_sql('e')} AS bucket FROM corpus),
    qb AS (SELECT vec_id AS q_id, e AS qv, bucket FROM sigb
           WHERE vec_id % 100 = 0 AND vec_id < {_QUERY_ID_CAP}),
    lsh AS ({top10(f'''
      SELECT qb.q_id, s.vec_id, {cos.format(q='qb.qv', c='s.e')} AS sim
      FROM sigb s JOIN qb ON s.bucket = qb.bucket AND s.vec_id <> qb.q_id''')}),
    tb AS (SELECT vec_id, e, unnest([{tables}]) AS tbucket FROM corpus),
    qtb AS (SELECT vec_id AS q_id, e AS qv, tbucket FROM tb
            WHERE vec_id % 100 = 0 AND vec_id < {_QUERY_ID_CAP}),
    lsh4 AS ({top10(f'''
      SELECT DISTINCT q_id, vec_id, sim FROM (
        SELECT qtb.q_id, s.vec_id, {cos.format(q='qtb.qv', c='s.e')} AS sim
        FROM tb s JOIN qtb ON s.tbucket = qtb.tbucket AND s.vec_id <> qtb.q_id)''')}),
    cells AS (SELECT vec_id, e, {duck_ivf_cell_sql('e')} AS cell FROM corpus),
    p1 AS ({probe(1)}),
    p4 AS ({probe(4)}),
    ivf1 AS ({top10(f'''
      SELECT p1.q_id, c.vec_id, {cos.format(q='p1.qv', c='c.e')} AS sim
      FROM cells c JOIN p1 ON c.cell = p1.cell AND c.vec_id <> p1.q_id''')}),
    ivf4 AS ({top10(f'''
      SELECT p4.q_id, c.vec_id, {cos.format(q='p4.qv', c='c.e')} AS sim
      FROM cells c JOIN p4 ON c.cell = p4.cell AND c.vec_id <> p4.q_id''')}),
    compact AS (SELECT vec_id, cell, {duck_pq_codes_sql('e')} AS codes FROM cells),
    p2 AS ({probe(2)}),
    short AS (
      SELECT q_id, vec_id FROM (
        SELECT qp.q_id, c.vec_id, row_number() OVER (
          PARTITION BY qp.q_id
          ORDER BY round({duck_pq_adc_sql('qp.qv', 'c.codes')}, 6) DESC, c.vec_id
        ) AS arn
        FROM compact c JOIN p2 qp ON c.cell = qp.cell AND c.vec_id <> qp.q_id)
      WHERE arn <= 32),
    ivfpq AS ({top10(f'''
      SELECT s.q_id, s.vec_id, {cos.format(q='q.qv', c='c.e')} AS sim
      FROM short s JOIN corpus c ON c.vec_id = s.vec_id
      JOIN q ON q.q_id = s.q_id''')})
    {row('srp_lsh', 'lsh')}
    UNION ALL {row('srp_lsh_4tables', 'lsh4')}
    UNION ALL {row('ivf', 'ivf1')}
    UNION ALL {row('ivf_p4', 'ivf4')}
    UNION ALL {row('ivf_pq', 'ivfpq')}
    """


@query("ext_ann_recall", tier="C", oracle=_duck_ann_recall_oracle())
def ext_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall@10 of the ANN pruning structures against the exact
    cosine ground truth — HASH-CHECKED since round 3: every hash coefficient
    (SRP planes, the 4 LSH tables, IVF centroids, PQ codebooks) is a
    plan-time literal shared with the DuckDB oracle, which replays all five
    approximate pipelines AND the exact truth end-to-end, so the driver's
    value hash covers the recall numbers themselves, not just row counts.
    ADC scores round to 6 decimals on both sides before the shortlist rank
    (summation-order fp noise cannot flip the rank-32 boundary).

    Queries = original vectors with vec_id % 100 == 0; corpus includes the
    planted copies, so each query's true #1 neighbor (its exact copy) is
    recoverable by construction — a recall floor of 1/k per query."""
    from flink_cdc_connectors_spark.functions import vectors as V

    # ONE feature pass over corpus+copies (round 12): every pruning
    # structure the six pipelines probe — SRP bucket, the 4 LSH table
    # buckets, IVF cell, the ordered top-4 probe cells, PQ codes — is
    # computed in a single projection and EAGERLY local-checkpointed
    # together with the vector and its norm.  Round 11 checkpointed only
    # (vec_id, e, nrm) and re-embedded the centroid/plane/codebook
    # literal trees in every branch; each embedding re-analyzed ~1k
    # literals per Dataset step, profiled at ~2.4 s of driver-side
    # py4j/analysis per TIMED run (3.6 s of a 4.7 s builder blocked on
    # the JVM with zero jobs running).  One projection = one analysis;
    # every branch below reads literal-free columns off a LogicalRDD
    # leaf.  Values are unchanged by construction: the identical
    # deterministic expressions compute the identical columns, once.
    # local-mode note (r3 ADVICE): checkpoint blocks are NOT rebuildable
    # on executor loss and localCheckpoint is documented unsafe with
    # dynamic allocation — the right trade in this single-JVM harness; a
    # cluster deployment with dynamic allocation should swap these for
    # reliable checkpoint/cache.
    feat = (
        _emb_corpus_with_copies(spark, sf_dir)
        .select(
            "vec_id",
            "e",
            V.l2_norm("e").alias("nrm"),
            V.srp_bucket("e").alias("bucket"),
            V.srp_bucket_tables("e", num_tables=4).alias("tbuckets"),
            V.ivf_centroid_id("e").alias("cell"),
            # ordered top-4 probe cells: ivf_centroid_topk slices a
            # sort_array, so probes=1/2 are exact PREFIXES of this array
            V.ivf_centroid_topk("e", probes=4).alias("cells4"),
            V.pq_codes("e").alias("codes"),
        )
        .localCheckpoint(eager=True)
    )
    is_query = (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < _QUERY_ID_CAP)
    vecs = feat.select("vec_id", "e", "nrm")
    queries = feat.filter(is_query).select(
        F.col("vec_id").alias("q_id"), F.col("e").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    # the candidate cosine, constructed ONCE (Columns are immutable name-
    # resolved trees — the same object is reusable across every branch;
    # round 11 re-built this ~25-HOF expression six times per run)
    sim = F.expr(f"round({V.dot_sql('qv', 'e')} / (qnrm * nrm), 6)").alias("sim")

    def topk(scored: DataFrame, k: int = 10) -> DataFrame:
        w = W.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
        return scored.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= k
        )

    # exact ground truth: brute-force cosine over the whole corpus —
    # LOCAL-CHECKPOINTED, not just cached (tiny: #queries x 10 rows).
    # Every method() below references it TWICE (truth count + semi-join
    # probe), so the returned union's logical tree embeds this subtree 10
    # times; with a plain cache() Catalyst still re-ANALYZES the full
    # brute-force lineage at every reference, and measured builder time was
    # 4.5-6.6 s of pure driver-side analysis before any job ran. The eager
    # checkpoint truncates the lineage to a LogicalRDD — the exact-truth
    # job runs once up front (it ran anyway as the cache fill) and the five
    # recall branches analyze against a 2-column leaf.
    exact = (
        topk(
            vecs.join(F.broadcast(queries), F.col("vec_id") != F.col("q_id")).select(
                "q_id",
                "vec_id",
                sim,
            )
        )
        .select("q_id", "vec_id")
        .localCheckpoint(eager=True)
    )
    # SRP-LSH: candidates restricted to the query's bucket
    sig = feat.select("vec_id", "e", "nrm", "bucket")
    q_sig = feat.filter(is_query).select(
        F.col("vec_id").alias("q_id"), F.col("e").alias("qv"),
        F.col("nrm").alias("qnrm"), "bucket",
    )
    lsh = topk(
        sig.join(F.broadcast(q_sig), "bucket")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            sim,
        )
    ).select("q_id", "vec_id")
    # multi-TABLE SRP-LSH: union of candidates over 4 independent coarser
    # tables (5 planes each) — the standard LSH recall/cost lever
    tsig = feat.select(
        "vec_id", "e", "nrm", F.explode("tbuckets").alias("tbucket")
    )
    q_tsig = feat.filter(is_query).select(
        F.col("vec_id").alias("q_id"), F.col("e").alias("qv"),
        F.col("nrm").alias("qnrm"), F.explode("tbuckets").alias("tbucket"),
    )
    lsh4 = topk(
        tsig.join(F.broadcast(q_tsig), "tbucket")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            sim,
        )
        # a pair may collide in several tables — count once; dedup AFTER
        # scoring so the distinct shuffles 3 scalars, not 64-double arrays
        .distinct()
    ).select("q_id", "vec_id")
    # IVF: corpus in its own cell; queries probe their top-P cells
    cells = feat.select("vec_id", "e", "nrm", "cell")

    def ivf_at(probes: int) -> DataFrame:
        q_cell = feat.filter(is_query).select(
            F.col("vec_id").alias("q_id"),
            F.col("e").alias("qv"),
            F.col("nrm").alias("qnrm"),
            # prefix of the stored ordered top-4 — identical to
            # ivf_centroid_topk(e, probes=probes) by construction
            F.explode(F.slice("cells4", 1, probes)).alias("cell"),
        )
        return topk(
            cells.join(F.broadcast(q_cell), "cell")
            .filter(F.col("vec_id") != F.col("q_id"))
            .select(
                "q_id",
                "vec_id",
                sim,
            )
        ).select("q_id", "vec_id")

    # IVF-PQ: same cell pruning as ivf_at(2), but candidates are ADC-scored
    # from 8 PQ codes alone (no raw vectors in the candidate join), top-32
    # ADC survivors exact-re-ranked — the ext_sim_search_pq operating point
    compact = feat.select("vec_id", "cell", "codes")
    q_pq = feat.filter(is_query).select(
        F.col("vec_id").alias("q_id"),
        F.col("e").alias("qv"),
        F.explode(F.slice("cells4", 1, 2)).alias("cell"),
    )
    adc = (
        compact.join(F.broadcast(q_pq), "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.expr(f"round({V.pq_adc_score_sql('qv', 'codes')}, 6)").alias("adc"),
        )
    )
    w_adc = W.partitionBy("q_id").orderBy(F.desc("adc"), F.asc("vec_id"))
    shortlist = adc.withColumn("arn", F.row_number().over(w_adc)).filter(
        F.col("arn") <= 32
    )
    ivf_pq = topk(
        shortlist.select("q_id", "vec_id")
        .join(vecs, "vec_id")
        .join(F.broadcast(queries), "q_id")
        .select(
            "q_id",
            "vec_id",
            sim,
        )
    ).select("q_id", "vec_id")

    # recall summary as ONE aggregate over the union of tagged hit sets
    # (round 12): the per-method (agg x 2 + crossJoin) form ran ~15 tiny
    # single-partition stages; this runs the same five semi-joins, one
    # groupBy, one 5-row left join (zero-hit methods keep their 0 via the
    # literal method frame) and one 1-row crossJoin.  Same rows, same
    # types: n_hits stays the BIGINT count, recall the same round(/, 4).
    methods = [
        ("srp_lsh", lsh),
        ("srp_lsh_4tables", lsh4),
        ("ivf", ivf_at(1)),
        ("ivf_p4", ivf_at(4)),
        ("ivf_pq", ivf_pq),
    ]
    tagged = [
        exact.join(approx, ["q_id", "vec_id"], "left_semi").select(
            F.lit(name).alias("method")
        )
        for name, approx in methods
    ]
    hit_rows = tagged[0]
    for t in tagged[1:]:
        hit_rows = hit_rows.unionByName(t)
    hit_counts = hit_rows.groupBy("method").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    names = spark.createDataFrame([(n,) for n, _ in methods], "method string")
    truth = exact.agg(F.count(F.lit(1)).alias("n_truth"))
    return (
        F.broadcast(names)
        .join(hit_counts, "method", "left")
        .crossJoin(F.broadcast(truth))
        .select(
            "method",
            "n_truth",
            F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
            F.round(
                F.coalesce("n_hits", F.lit(0).cast("long")) / F.col("n_truth"), 4
            ).alias("recall_at_10"),
        )
    )
