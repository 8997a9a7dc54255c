"""Text-analysis functions (Tier C building blocks).

All pure Column expressions — they compile into whole-stage codegen and
never leave the JVM. Deterministic by construction (hash-derived, no RNG),
so results are stable across runs, executors, and retries — the property
the reference's exactly-once contract demands of any derived column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# Column | str dispatch (round 12, same pattern as functions/vectors.py):
# a str argument is a Spark-SQL expression fragment and the WHOLE helper
# expression is built as ONE F.expr parse instead of one py4j round trip
# per operator (~0.3 ms each on the bench box; a 16-member minhash
# signature costs ~240 gateway calls through the Column API).  Both forms
# yield the identical Catalyst tree — A/B pinned in
# tests/test_functions.py::test_text_sql_forms_match_column_forms.
#
# Conf dependency (ADVICE r12 #4): the SQL forms write regexes as '\\s+'
# inside single-quoted SQL literals, which lexes to the same \s+ pattern as
# the Column forms' r"\s+" only under the DEFAULT
# spark.sql.parser.escapedStringLiterals=false.  session.get_spark pins
# that default explicitly; a session built elsewhere with the conf flipped
# would make the SQL twins emit the literal backslash-backslash-s and
# silently drift the dedup keys.


def normalize_text_sql(c: str) -> str:
    """Spark-SQL form of :func:`normalize_text` (same tree)."""
    return f"lower(trim(regexp_replace({c}, '\\\\s+', ' ')))"


def words_sql(c: str) -> str:
    """Spark-SQL form of :func:`words` (same tree)."""
    return f"split({normalize_text_sql(c)}, '\\\\s+')"


def shingles_sql(words_sql_frag: str, n: int = 3) -> str:
    """Spark-SQL form of :func:`shingles` (same tree)."""
    w = words_sql_frag
    positions = (
        f"CASE WHEN size({w}) >= {n} THEN sequence(1, size({w}) - {n - 1})"
        " ELSE cast(array() as array<int>) END"
    )
    return (
        f"array_distinct(transform({positions},"
        f" i -> array_join(slice({w}, i, {n}), ' ')))"
    )


def normalize_text(c: Column | str) -> Column:
    """Lowercase, collapse whitespace, trim — the canonical dedup key."""
    if isinstance(c, str):
        return F.expr(normalize_text_sql(c))
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def words(c: Column | str) -> Column:
    """Whitespace tokenization of normalized text."""
    if isinstance(c, str):
        return F.expr(words_sql(c))
    return F.split(normalize_text(c), r"\s+")


def shingles(words_col: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams (array<string>) — MinHash/Jaccard input.

    slice+array_join per position, not n element_at lookups in the lambda:
    the element_at tree evaluates interpreted (~7x slower measured);
    slice+join stays vectorized. Short docs (< n words) yield no grams."""
    if isinstance(words_col, str):
        return F.expr(shingles_sql(words_col, n))
    positions = F.when(
        F.size(words_col) >= n,
        F.sequence(F.lit(1), F.size(words_col) - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(positions, lambda i: F.array_join(F.slice(words_col, i, n), " "))
    )


def _salted_xxhash64(i: int):
    """Single-ARITY lambda factory for ``transform``.  The obvious loop
    closure ``lambda s, i=i: F.xxhash64(F.lit(i), s)`` is a silent trap:
    PySpark sniffs the callable's arity, a Python default argument still
    counts toward it, and a two-parameter callable selects ``transform``'s
    index-aware form ``(x, idx) -> ...`` — so ``i`` was bound to the
    ELEMENT INDEX, not the loop literal, collapsing all ``num_hashes``
    members into the same ``xxhash64(position, s)`` value (caught in round
    10 by the new DuckDB xxhash64 oracle; the rows-only check never could:
    the degenerate family is still deterministic)."""
    return lambda s: F.xxhash64(F.lit(i), s)


def minhash_signature_sqls(
    shingles_sql_frag: str, num_hashes: int = 16
) -> list[str]:
    """Spark-SQL forms of the :func:`minhash_signature` members (same
    trees; the salt literal is the INT ``i`` in both forms)."""
    return [
        f"array_min(transform({shingles_sql_frag}, s -> xxhash64({i}, s)))"
        for i in range(num_hashes)
    ]


def minhash_signature(
    shingles_col: Column | str, num_hashes: int = 16
) -> list[Column]:
    """MinHash signature: min over shingles of hash_i(shingle) for each of
    ``num_hashes`` deterministic hash-family members (xxhash64 salted by i).

    xxhash64 is JVM-native and ~10x cheaper than md5 while keeping the
    collision behavior MinHash needs."""
    if isinstance(shingles_col, str):
        return [
            F.expr(s).alias(f"mh{i}")
            for i, s in enumerate(minhash_signature_sqls(shingles_col, num_hashes))
        ]
    return [
        F.array_min(
            F.transform(shingles_col, _salted_xxhash64(i))
        ).alias(f"mh{i}")
        for i in range(num_hashes)
    ]


def minhash_signatures_md5(
    df, id_col: str, shingles_col: str, num_hashes: int = 16
):
    """SQL-ORACLE-EXPRESSIBLE MinHash family: member i = lexicographic min
    over shingles of ``md5('i:' || shingle)`` (lowercase hex on both Spark
    and DuckDB, so an oracle can replay the identical signature).
    Returns a DataFrame (id_col, mh0..mh{n-1}).

    Any uniform hash family gives statistically identical MinHash/banding
    behavior; this one trades the ~10x hashing speed of xxhash64 for a
    CHEAP oracle replay (one md5() call per member vs the ~5 s staged
    xxhash64 pipeline functions/xxhash_sql.py needs per oracle).  Since
    round 11 xxhash64 IS oracle-replayable, so the remaining users are a
    cost choice, not an expressibility pin: ``ext_dedup_incremental`` and
    the ``cdc_stream_dedup_index`` capstone keep this family (their
    oracles replay signatures inside already-heavy incremental MERGE
    replays); the production dedup path (``ext_dedup_minhash``) and the
    recall measurement (``ext_minhash_recall``, switched in round 11)
    use the shipped JVM-native xxhash64 family.

    Deliberately explode -> groupBy MIN aggregates, NOT
    ``array_min(transform(...))`` like the xxhash64 family: on Spark 4.1,
    ``array_min`` over a transform-produced STRING array can return a value
    that is not an element of the array at all when the input rides an
    in-memory cache (UTF8String buffer aliasing in the HOF result; LONG
    minhashes are by-value and unaffected). The row-aggregate MIN copies
    into its buffer and is immune — pinned by
    tests/test_functions.py::test_md5_minhash_stable_over_cache."""
    ids = df.select(id_col, F.explode(shingles_col).alias("_s"))
    # one expr parse per member instead of ~8 gateway calls each (round 12;
    # identical tree: min over md5(concat('<i>:', _s)))
    mins = [
        F.expr(f"min(md5(concat('{i}:', _s)))").alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return ids.groupBy(id_col).agg(*mins)


def simhash(words_col: Column, bits: int = 64) -> Column:
    """SimHash fingerprint (Charikar, STOC'02): per-token 64-bit hash; each
    bit position votes +1/-1 across tokens; the sign pattern of the vote
    sums is the fingerprint. Near-duplicate texts differ in few bits (small
    Hamming distance). Returns BIGINT.

    Pure array algebra — ONE pass over the token array accumulating a
    64-long vote vector (zip_with), then a fold of the signs into the
    64-bit word. No UDF, stays in codegen."""

    def bit_votes_of(h: Column) -> Column:
        return F.array(
            *[
                F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                    F.lit(-1)
                )
                for b in range(bits)
            ]
        )

    hashes = F.transform(words_col, lambda w: F.xxhash64(w))
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(acc, bit_votes_of(h), lambda a, v: a + v),
    )
    # Signed-long bit values (1<<63 wraps to Long.MIN); a literal array so
    # the vote vector is referenced exactly once in the final fold.
    powers = F.array(
        *[F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long") for b in range(bits)]
    )
    return F.aggregate(
        F.zip_with(
            votes, powers, lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def simhash_df(df, id_col: str, words_col: Column, bits: int = 64):
    """Corpus-scale SimHash: same fingerprint as :func:`simhash`, computed
    as explode -> hash-aggregate instead of a higher-order-function fold.

    The Column form materializes a 64-element vote array per TOKEN (a
    64-``when`` array zipped into the accumulator) — measured ~6x slower
    over the sf0.1 corpus than this form, where each token becomes a row,
    the 64 per-bit one-counts are plain SUM aggregates with map-side
    partial aggregation (shuffle payload: one 65-long row per doc per
    partition), and the sign test ``2*ones_b > n_tokens`` reassembles the
    word. Identical output to ``simhash`` for non-null token arrays.

    Returns a DataFrame (id_col, sig)."""
    tok = df.select(id_col, F.explode(words_col).alias("_w")).select(
        id_col, F.xxhash64("_w").alias("_h")
    )
    # The 64 per-bit one-counts and the 64-term sign fold are built as SQL
    # strings (round 12): the Column form cost ~1.5k py4j round trips
    # (~0.5 s of driver time) per construction.  Identical trees — the
    # b=63 power uses shiftleft(1L, 63), which wraps to Long.MIN exactly
    # like the F.lit(-(1 << 63)).cast('long') it replaces.
    ones = [
        F.expr(f"sum(shiftright(_h, {b}) & 1)").alias(f"_o{b}")
        for b in range(bits)
    ]
    agg = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"), *ones)
    # vote_b = 2*ones_b - n ; bit set iff vote > 0. Bits are disjoint, so a
    # SUM of per-bit terms equals the bitwise OR and stays one flat
    # codegen expression (1<<63 wraps to Long.MIN, matching simhash()).
    sig = F.expr(
        "("
        + " + ".join(
            f"CASE WHEN _o{b} * 2 > _n THEN shiftleft(cast(1 as bigint), {b})"
            " ELSE cast(0 as bigint) END"
            for b in range(bits)
        )
        + ")"
    )
    return agg.select(id_col, sig.alias("sig"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def token_count(c: Column) -> Column:
    """Whitespace token count of normalized text."""
    return F.size(words(c))


def bpe_ish_token_count(c: Column) -> Column:
    """BPE-flavored token estimate: word-boundary pieces + punctuation +
    digit runs counted separately (a deterministic stand-in for a real
    tokenizer's token count)."""
    pieces = F.split(
        F.regexp_replace(normalize_text(c), r"([^\w\s]|\d+)", " $1 "), r"\s+"
    )
    return F.size(F.filter(pieces, lambda p: p != ""))


# Tiny per-language stopword anchors for the n-gram language heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " les "],
    "es": [" el ", " y ", " de la "],
}


def _occurrences(haystack: Column, needle: str) -> Column:
    """Non-overlapping occurrence count via length arithmetic (JVM-side)."""
    return (
        (F.length(haystack) - F.length(F.replace(haystack, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("int")


def lang_id_scores(c: Column) -> Column:
    """map<lang,int>: marker-hit counts over the padded lowercase text."""
    padded = F.concat(F.lit(" "), normalize_text(c), F.lit(" "))
    return F.map_from_arrays(
        F.array(*[F.lit(lang) for lang in LANG_MARKERS]),
        F.array(
            *[
                sum((_occurrences(padded, m) for m in markers), start=F.lit(0))
                for markers in LANG_MARKERS.values()
            ]
        ),
    )


def quality_score(c: Column) -> Column:
    """Heuristic document quality in [0,1]: length band, punctuation ratio,
    stopword presence — the usual pretraining-corpus filters."""
    n = F.length(c)
    n_punct = n - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    punct_ratio = n_punct / F.greatest(n, F.lit(1))
    has_stop = (
        F.size(F.array_intersect(words(c), F.array(F.lit("the"), F.lit("and"), F.lit("of"), F.lit("a"), F.lit("to")))) > 0
    )
    len_ok = (n >= 100) & (n <= 20_000)
    return F.round(
        (
            F.when(len_ok, 0.4).otherwise(0.0)
            + F.when(punct_ratio < 0.2, 0.3).otherwise(0.0)
            + F.when(has_stop, 0.3).otherwise(0.0)
        ),
        2,
    )


def rolling_fingerprint(c: Column, window: int = 8) -> Column:
    """Winnowing-style document fingerprint: min xxhash64 over each
    ``window`` of tokens, distinct-collected — a compact set identifying
    the document under local edits (Schleimer et al., SIGMOD'03)."""
    w = words(c)
    positions = F.when(
        F.size(w) >= window,
        F.sequence(F.lit(1), F.size(w) - (window - 1)),
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        positions, lambda i: F.xxhash64(F.array_join(F.slice(w, i, window), " "))
    )
    return F.array_distinct(grams)
