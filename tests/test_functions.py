"""Unit tests for the engine function library (functions/text, functions/vectors)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from flink_cdc_connectors_spark.functions import text as T
from flink_cdc_connectors_spark.functions import vectors as V


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_normalize_and_tokens(spark):
    df = spark.createDataFrame([("  Hello   WORLD  foo ",)], "t string")
    row = df.select(
        T.normalize_text(F.col("t")).alias("n"),
        T.token_count(F.col("t")).alias("tc"),
        T.shingles(T.words(F.col("t")), 2).alias("sh"),
    ).first()
    assert row["n"] == "hello world foo"
    assert row["tc"] == 3
    assert row["sh"] == ["hello world", "world foo"]


def test_simhash_near_vs_far(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = base + " extra"
    far = "completely different words about spark catalyst tungsten shuffles exchange"
    df = spark.createDataFrame([(base, near, far)], "a string, b string, c string")
    row = df.select(
        T.hamming64(
            T.simhash(T.words(F.col("a"))), T.simhash(T.words(F.col("b")))
        ).alias("near_d"),
        T.hamming64(
            T.simhash(T.words(F.col("a"))), T.simhash(T.words(F.col("c")))
        ).alias("far_d"),
        T.simhash(T.words(F.col("a"))).alias("sig"),
    ).first()
    assert row["near_d"] < row["far_d"]
    assert row["near_d"] <= 12
    assert row["far_d"] >= 16
    # determinism across evaluations
    again = df.select(T.simhash(T.words(F.col("a"))).alias("sig")).first()["sig"]
    assert row["sig"] == again


def test_bpe_ish_token_count_counts_punct_and_digits(spark):
    df = spark.createDataFrame([("hello, world! 42 times",)], "t string")
    plain = df.select(T.token_count(F.col("t")).alias("n")).first()["n"]
    bpe = df.select(T.bpe_ish_token_count(F.col("t")).alias("n")).first()["n"]
    assert bpe > plain  # punctuation and digit runs become their own pieces


def test_lang_id_scores_prefers_right_language(spark):
    df = spark.createDataFrame(
        [("the cat and the dog of the house",), ("der Hund und die Katze und der Vogel",)],
        "t string",
    )
    rows = df.select(T.lang_id_scores(F.col("t")).alias("m")).collect()
    en, de = rows[0]["m"], rows[1]["m"]
    assert en["en"] > en["de"]
    assert de["de"] > de["en"]


def test_vector_ops(spark):
    df = spark.createDataFrame([([1.0, 2.0, 2.0], [2.0, 4.0, 4.0], [-2.0, 1.0, 0.0])], "a array<double>, b array<double>, c array<double>")
    row = df.select(
        V.dot(F.col("a"), F.col("b")).alias("dot"),
        V.l2_norm(F.col("a")).alias("norm"),
        V.cosine_sim(F.col("a"), F.col("b")).alias("cos_ab"),
        V.cosine_sim(F.col("a"), F.col("c")).alias("cos_ac"),
        V.srp_bucket(F.col("a")).alias("bucket_a"),
        V.srp_bucket(F.col("b")).alias("bucket_b"),
        V.ivf_centroid_id(F.col("a")).alias("cid"),
    ).first()
    assert math.isclose(row["dot"], 18.0)
    assert math.isclose(row["norm"], 3.0)
    assert math.isclose(row["cos_ab"], 1.0, abs_tol=1e-12)
    assert abs(row["cos_ac"]) < 0.01  # orthogonal
    # parallel vectors land in the same SRP bucket by construction
    assert row["bucket_a"] == row["bucket_b"]
    assert len(row["bucket_a"]) == 8 and set(row["bucket_a"]) <= {"0", "1"}
    assert 0 <= row["cid"] < 16


def test_rolling_fingerprint_stable_under_suffix_edit(spark):
    base = " ".join(f"w{i}" for i in range(40))
    edited = base + " tail"
    df = spark.createDataFrame([(base, edited)], "a string, b string")
    row = df.select(
        T.rolling_fingerprint(F.col("a")).alias("fa"),
        T.rolling_fingerprint(F.col("b")).alias("fb"),
    ).first()
    overlap = len(set(row["fa"]) & set(row["fb"])) / len(set(row["fa"]))
    assert overlap > 0.9  # local edit perturbs few windows


def test_pq_codes_and_adc(spark):
    """PQ codes are deterministic, in [0, k); ADC score of a vector against
    its OWN codes approximates the true self-dot better than against a
    far vector's codes, and identical vectors get identical codes."""
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-0.5, 0.5) for _ in range(64)]) for i in range(40)]
    rows.append((100, rows[0][1]))  # exact copy of vec 0
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    coded = df.select(
        "vec_id", "v", V.pq_codes(F.col("v")).alias("codes")
    ).cache()
    got = {r["vec_id"]: r["codes"] for r in coded.collect()}
    assert all(len(c) == 8 for c in got.values())
    assert all(0 <= x < 16 for c in got.values() for x in c)
    assert got[100] == got[0]  # identical vectors -> identical codes
    # determinism across a second evaluation
    again = {r["vec_id"]: r["codes"] for r in coded.unpersist().collect()}
    assert again == got

    # ADC approximates the true dot product: rank correlation sanity —
    # for each query, the ADC-top neighbor's true dot is near the true max.
    a = coded.select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"))
    pairs = a.crossJoin(coded.select("vec_id", "v", "codes")).filter(
        F.col("q_id") != F.col("vec_id")
    )
    scored = pairs.select(
        "q_id",
        "vec_id",
        V.dot(F.col("qv"), F.col("v")).alias("true_dot"),
        V.pq_adc_score(F.col("qv"), F.col("codes")).alias("adc"),
    ).toPandas()
    # the planted copy must be ADC-found for query 0 (max adc over its row)
    q0 = scored[scored.q_id == 0]
    assert q0.loc[q0.adc.idxmax()].vec_id == 100
    corr = scored.groupby("q_id").apply(
        lambda g: g.true_dot.corr(g.adc), include_groups=False
    )
    assert corr.mean() > 0.5  # ADC tracks the true inner product


def test_doc_chunk_covers_corpus(spark, sf_dir):
    """Chunking invariants: starts spaced by the stride from 1; every token
    of every doc lands in >=1 chunk (coverage); chunk token counts match
    the window/remainder arithmetic."""
    from flink_cdc_connectors_spark.queries.tier_c_ext3 import (
        _CHUNK,
        _STRIDE,
        ext_doc_chunk,
    )
    from flink_cdc_connectors_spark.sources.loaders import load_table

    chunks = ext_doc_chunk(spark, sf_dir).toPandas()
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n_words"))
        .toPandas()
        .set_index("doc_id")["n_words"]
    )
    for doc_id, g in chunks.groupby("doc_id"):
        g = g.sort_values("chunk_id")
        n = docs[doc_id]
        starts = g["chunk_start"].tolist()
        assert starts == list(range(1, n + 1, _STRIDE))
        # coverage: consecutive windows overlap (stride < chunk size)
        assert all(
            s + _CHUNK >= nxt for s, nxt in zip(starts, starts[1:])
        )
        assert (g["n_tok"] == [min(_CHUNK, n - s + 1) for s in starts]).all()


def test_heartbeat_positions_advance(spark, sf_dir):
    """Heartbeat positions are non-decreasing in interval order and end at
    the log's max position — the offset-advance property heartbeats exist
    for; parsing drops them from data output."""
    from flink_cdc_connectors_spark.queries.tier_a import cdc_heartbeat
    from flink_cdc_connectors_spark.sources.envelope import (
        heartbeat_envelopes,
        parse_debezium_json,
    )
    from flink_cdc_connectors_spark.sources.loaders import load_table

    hb = cdc_heartbeat(spark, sf_dir).toPandas().sort_values("hb_ts")
    assert (hb["pos"].diff().dropna() >= 0).all()
    e = load_table(spark, sf_dir, "events")
    assert hb["pos"].iloc[-1] == e.agg(F.max("event_id")).first()[0]
    raw = heartbeat_envelopes(e, interval_ms=3_600_000)
    assert parse_debezium_json(raw).count() == 0  # heartbeats are not data


def test_md5_minhash_stable_over_cache(spark, sf_dir):
    """Regression: on Spark 4.1, array_min over a transform-produced STRING
    array can return a value that is NOT an element of the array when the
    input rides an in-memory cache (UTF8String buffer aliasing — observed
    as run-varying phantom LSH band collisions in ext_minhash_recall).
    minhash_signatures_md5 uses explode + groupBy MIN instead; this pins
    both the workaround's correctness against a Python-computed truth and
    its stability across repeated evaluation of the same cached input."""
    import hashlib

    from flink_cdc_connectors_spark.functions import text as T
    from flink_cdc_connectors_spark.sources.loaders import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    sh = docs.select("doc_id", T.shingles(T.words(F.col("text"))).alias("sh")).cache()
    try:
        truth = {
            r["doc_id"]: min(
                hashlib.md5(f"0:{x}".encode()).hexdigest() for x in r["sh"]
            )
            for r in sh.collect()
            if r["sh"]
        }
        for _ in range(2):
            got = {
                r["doc_id"]: r["mh0"]
                for r in T.minhash_signatures_md5(sh, "doc_id", "sh", 2).collect()
            }
            assert got == truth
    finally:
        sh.unpersist()


# -- WKB -> GeoJSON (MySqlDeserializationConverterFactory.java:80-112) ------


def _wkb_point(x, y, little=True, srid=None):
    import struct as _s

    e = "<" if little else ">"
    t = 1 | (0x20000000 if srid is not None else 0)
    b = bytes([1 if little else 0]) + _s.pack(e + "I", t)
    if srid is not None:
        b += _s.pack(e + "I", srid)
    return b + _s.pack(e + "dd", x, y)


def test_wkb_point_to_geojson():
    import json

    from flink_cdc_connectors_spark.functions.spatial import wkb_to_geojson

    got = json.loads(wkb_to_geojson(_wkb_point(1.0, 2.0)))
    assert got == {"type": "Point", "coordinates": [1.0, 2.0], "srid": 0}


def test_wkb_big_endian_and_struct_srid_precedence():
    import json

    from flink_cdc_connectors_spark.functions.spatial import wkb_to_geojson

    # big-endian blob; the Debezium struct's srid wins over the default
    got = json.loads(wkb_to_geojson(_wkb_point(3.5, -7.25, little=False), srid=4326))
    assert got == {"type": "Point", "coordinates": [3.5, -7.25], "srid": 4326}


def test_wkb_ewkb_embedded_srid():
    import json

    from flink_cdc_connectors_spark.functions.spatial import wkb_to_geojson

    got = json.loads(wkb_to_geojson(_wkb_point(0.0, 1.0, srid=3857)))
    assert got["srid"] == 3857


def test_wkb_polygon_and_collection():
    import json
    import struct as _s

    from flink_cdc_connectors_spark.functions.spatial import wkb_to_geojson

    ring = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 0.0)]
    poly = bytes([1]) + _s.pack("<I", 3) + _s.pack("<I", 1) + _s.pack("<I", len(ring))
    for x, y in ring:
        poly += _s.pack("<dd", x, y)
    got = json.loads(wkb_to_geojson(poly))
    assert got["type"] == "Polygon"
    assert got["coordinates"] == [[list(p) for p in ring]]

    coll = bytes([1]) + _s.pack("<I", 7) + _s.pack("<I", 2) + _wkb_point(1, 2) + _wkb_point(3, 4)
    got = json.loads(wkb_to_geojson(coll))
    assert got["type"] == "GeometryCollection"
    assert [g["coordinates"] for g in got["geometries"]] == [[1.0, 2.0], [3.0, 4.0]]
    assert "coordinates" not in got  # collections carry 'geometries' only


def test_wkb_multipoint_flattens_member_coordinates():
    import json
    import struct as _s

    from flink_cdc_connectors_spark.functions.spatial import wkb_to_geojson

    mp = bytes([1]) + _s.pack("<I", 4) + _s.pack("<I", 2) + _wkb_point(1, 2) + _wkb_point(3, 4)
    got = json.loads(wkb_to_geojson(mp))
    assert got == {"type": "MultiPoint", "coordinates": [[1.0, 2.0], [3.0, 4.0]], "srid": 0}


def test_wkb_malformed_fails_loudly():
    import pytest as _pytest

    from flink_cdc_connectors_spark.functions.spatial import wkb_to_geojson

    with _pytest.raises(ValueError):
        wkb_to_geojson(b"\x05\x01\x00\x00\x00")  # bad byte-order flag
    with _pytest.raises(ValueError):
        wkb_to_geojson(_wkb_point(1, 2)[:-4])  # truncated coords
    with _pytest.raises(ValueError):
        wkb_to_geojson(_wkb_point(1, 2) + b"\x00")  # trailing bytes


def test_geometry_to_geojson_column(spark):
    import json

    from flink_cdc_connectors_spark.functions.spatial import geometry_to_geojson

    rows = [(_wkb_point(1.0, 2.0), 4326), (None, None), (_wkb_point(5.0, 6.0, little=False), None)]
    df = spark.createDataFrame(rows, "wkb binary, srid int")
    got = [r["geo"] for r in df.select(geometry_to_geojson("wkb", "srid").alias("geo")).collect()]
    assert json.loads(got[0])["srid"] == 4326
    assert got[1] is None
    assert json.loads(got[2]) == {"type": "Point", "coordinates": [5.0, 6.0], "srid": 0}


def test_wkb_multi_rejects_mismatched_members():
    """Corrupt Multi* WKB whose members are the wrong type fails loudly —
    never silently emits wrong-shaped coordinates."""
    import struct as _s

    import pytest as _pytest

    from flink_cdc_connectors_spark.functions.spatial import wkb_to_geojson

    # MultiLineString (type 5) whose members are Points
    bad = bytes([1]) + _s.pack("<I", 5) + _s.pack("<I", 2) + _wkb_point(1, 2) + _wkb_point(3, 4)
    with _pytest.raises(ValueError, match="non-LineString members"):
        wkb_to_geojson(bad)


def test_fingerprint_hash_family_pins_across_the_scale_gate(spark, sf_dir):
    """ext_fingerprint's cross-scale contract (ADVICE r8): the corpus-size
    auto-gate picks the hash FAMILY, so values are not comparable across
    datasets straddling the gate — a consumer persisting fingerprints pins
    the family explicitly. Forcing a family must (a) reproduce the same
    values the auto gate would produce when the gate agrees, (b) produce
    the OTHER family's values when forced across the gate, with equality
    structure (copy pairs) preserved, and (c) reject unknown families."""
    import pytest as _pytest

    from flink_cdc_connectors_spark.queries.tier_c import ext_fingerprint

    auto = ext_fingerprint(spark, sf_dir).toPandas().set_index("doc_id")
    md5 = (
        ext_fingerprint(spark, sf_dir, hash_family="md5")
        .toPandas()
        .set_index("doc_id")
    )
    xx = (
        ext_fingerprint(spark, sf_dir, hash_family="xxhash64")
        .toPandas()
        .set_index("doc_id")
    )
    # the test fixture is below the gate: auto == md5, xx differs in value
    assert auto["fingerprint"].sort_index().equals(md5["fingerprint"].sort_index())
    assert not xx["fingerprint"].sort_index().equals(
        md5["fingerprint"].sort_index()
    )
    # the guaranteed equality structure is family-independent: a pair
    # sharing its FULL gram set (the planted copies at doc_id + 1M) shares
    # the min-gram under any per-gram hash. (Partial-overlap pairs may
    # collide on the min under one family and not another — that is
    # one-permutation MinHash variance, not part of the contract.)
    for pdf in (md5, xx):
        planted = pdf[pdf.index >= 1_000_000]
        originals = pdf.loc[planted.index - 1_000_000, "fingerprint"].to_numpy()
        assert (planted["fingerprint"].to_numpy() == originals).all(), (
            "a planted full-gram copy must share its fingerprint in-family"
        )
    with _pytest.raises(ValueError, match="hash_family"):
        ext_fingerprint(spark, sf_dir, hash_family="sha1")


def test_duck_xxh64_matches_spark(spark):
    """functions/xxhash_sql.py must reproduce Spark's xxhash64 bit-for-bit:
    single-string (seed 42), the lit(i)-salted family (constant-seed and
    seed-column staged forms), and the chained multi-long band form. This
    is the foundation of the round-10 minhash/simhash value oracles."""
    import duckdb
    from pyspark.sql import functions as F

    from flink_cdc_connectors_spark.functions.xxhash_sql import (
        duck_utf8_bytes_sql,
        duck_xxh64_bytes_sql,
        duck_xxh64_long_sql,
        duck_xxh64_family_staged_ctes,
        spark_seed_for_int,
        to_signed_sql,
        to_unsigned_sql,
    )

    # EVERY byte length 0..90 (covers all stripe/8-byte/4-byte/byte-tail
    # combinations through two 32-byte stripes) plus multibyte UTF-8 —
    # the full class sweep the module docstring claims is pinned here
    strings = [chr(ord("a") + (k % 26)) * k for k in range(91)] + [
        "hello world", "naïve café 日本語", "three word shingle", "é" * 20,
    ]
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    exp = {
        r["s"]: (r["h42"], r["h5"])
        for r in df.select(
            "s",
            F.xxhash64("s").alias("h42"),
            F.xxhash64(F.lit(5), F.col("s")).alias("h5"),
        ).collect()
    }

    con = duckdb.connect()
    # constant-seed single-expression form
    sql = f"""
    WITH t AS (SELECT unnest(?) AS shingle),
    db2 AS (SELECT shingle, b, len(b) AS n
            FROM (SELECT shingle, {duck_utf8_bytes_sql('shingle')} AS b FROM t))
    SELECT shingle, {to_signed_sql(duck_xxh64_bytes_sql('b', 'n', 42))} AS h42,
           {to_signed_sql(duck_xxh64_bytes_sql('b', 'n', spark_seed_for_int(5)))} AS h5
    FROM db2
    """
    for s, h42, h5 in con.execute(sql, [strings]).fetchall():
        assert (h42, h5) == exp[s], s
    # staged wide-family form (the one the oracles use)
    sql2 = f"""
    WITH t AS (SELECT unnest(?) AS shingle),
    db2 AS (SELECT shingle, b, len(b) AS n
            FROM (SELECT shingle, {duck_utf8_bytes_sql('shingle')} AS b FROM t)),
    {duck_xxh64_family_staged_ctes('db2', [(-1, 42), (5, spark_seed_for_int(5))], 'hw')}
    SELECT shingle, h_p, h_5 FROM hw
    """
    for s, hp, h5 in con.execute(sql2, [strings]).fetchall():
        assert (hp, h5) == exp[s], s
    # chained 4-long band form
    longs = [(-3, 2**62, -(2**63), 41)]
    lf = spark.createDataFrame(longs, "a long, b long, c long, d long")
    want = lf.select(F.xxhash64("a", "b", "c", "d").alias("h")).first()["h"]
    expr = "42::UBIGINT"
    for c in "abcd":
        expr = duck_xxh64_long_sql(to_unsigned_sql(c), expr)
    got = con.execute(
        f"SELECT {to_signed_sql(expr)} FROM (SELECT {longs[0][0]} a, {longs[0][1]} b, "
        f"{longs[0][2]} c, {longs[0][3]} d)"
    ).fetchone()[0]
    assert got == want


def test_minhash_members_are_independent(spark):
    """Regression for the round-10 arity bug: a `lambda s, i=i:` closure
    (arity 2 through the default arg) selects transform's INDEX-AWARE
    form, binding i to the element index — every member then hashes
    xxhash64(position, s) and the whole family collapses to one value.
    The members must be pairwise distinct and equal the lit(i)-salted
    reference."""
    from pyspark.sql import functions as F

    from flink_cdc_connectors_spark.functions.text import minhash_signature

    df = spark.createDataFrame(
        [(["apple pie crust", "banana split cream", "cherry tart glaze"],)],
        "sh array<string>",
    )
    row = df.select(*minhash_signature(F.col("sh"), 16)).first()
    vals = [row[f"mh{i}"] for i in range(16)]
    assert len(set(vals)) == 16, "minhash members collapsed"
    ref = df.select(
        *[
            F.array_min(
                F.expr(f"transform(sh, s -> xxhash64({i}, s))")
            ).alias(f"r{i}")
            for i in range(16)
        ]
    ).first()
    assert vals == [ref[f"r{i}"] for i in range(16)]


def test_round_half_up6_matches_spark_round(spark):
    """GEMM-ROUNDING-NOTE closure pin (VERDICT r10 #5): the numpy scale
    paths' vectors.round_half_up6 must equal Spark's F.round(x, 6)
    (BigDecimal HALF_UP over the shortest decimal repr) element-for-
    element — including exact half-boundary values, where np.round
    (half-EVEN) provably differs.  This is the tie-break A/B: a score at
    a boundary rounds the same on both sides of every engine gate."""
    import numpy as np

    boundary = [
        0.1234565,    # shortest repr ON a half-boundary, binary just below
        -0.1234565,
        0.9999995,
        -0.9999995,
        0.0000005,
        -0.0000005,
        0.5e-6,
        2.5e-6,       # half-even would give 0.000002, HALF_UP gives 0.000003
        -2.5e-6,
        0.1234575,    # half-even rounds UP here too (odd->even) — still must match
        1.0, -1.0, 0.0,
        0.123456499999999,  # just below the boundary
        0.12345650000001,   # just above
        999.1234565,        # half-boundary at the guard's domain edge
        -999.1234565,
    ]
    rng = np.random.default_rng(42)
    rand = (rng.random(20_000) * 2.0 - 1.0).tolist()
    vals = boundary + rand
    arr = np.array(vals, dtype=np.float64)
    got = V.round_half_up6(arr)
    want = [
        r["r"]
        for r in (
            spark.createDataFrame([(float(v),) for v in vals], "x double")
            .select(F.round("x", 6).alias("r"))
            .collect()
        )
    ]
    for i, (g, w) in enumerate(zip(got.tolist(), want)):
        assert g == w, f"idx {i}: input {vals[i]!r}: helper {g!r} != spark {w!r}"
    # non-vacuity: np.round (the pre-round-11 mode) disagrees with Spark on
    # at least one of the boundary cases, so this test distinguishes modes
    old = np.round(np.array(boundary), 6).tolist()
    spark_b = want[: len(boundary)]
    assert old != spark_b, "boundary cases no longer exercise the mode split"
    # shape + NaN passthrough
    m = np.array([[0.1234565, float("nan")], [-2.5e-6, 0.25]])
    out = V.round_half_up6(m)
    assert out.shape == m.shape and math.isnan(out[0, 1])
    assert out[0, 0] == 0.123457 and out[1, 0] == -0.000003 and out[1, 1] == 0.25
    # domain guard (ADVICE r11, tightened r12): the absolute-threshold
    # band detector is only valid while ulp(x*1e6) << 1e-6; out-of-domain
    # magnitudes must raise, not silently mis-round — in either sign.
    # 17083.4064815 is the proof the old 1e12 bound was unsound: inside
    # that bound, yet ulp(1.7e10) = 1.9e-6 > the band, so it silently
    # rounded half-even (…481) where Spark HALF_UP gives …482.
    import pytest as _pytest

    for bad in (2e3, -2e3, 17083.4064815, 2e6, -2e6, 1e9):
        with _pytest.raises(ValueError, match="validity domain"):
            V.round_half_up6(np.array([0.5, bad]))
    # the guard's edge sits past any similarity-score magnitude; the
    # boundary list above pins a true half-boundary at 999.x against
    # Spark, so the edge of the admitted domain is value-proven too


def test_vector_sql_forms_match_column_forms(spark):
    """Round-12 driver-latency optimization: every vector constructor
    accepts a SQL-string column reference and builds the WHOLE expression
    as one F.expr parse (one py4j round trip) instead of dozens of HOF
    gateway calls.  The two forms must stay BIT-IDENTICAL — same Catalyst
    functions, same literals, same lambda structure — or the ANN keys'
    value hashes drift.  Pin every helper's A/B on deterministic vectors,
    including the slice-defense path (len < dim)."""
    rows = 64
    df = spark.range(rows).selectExpr(
        "transform(sequence(0, 63), i -> sin(id * 17 + i) * 2.0) AS a",
        "transform(sequence(0, 63), i -> cos(id * 29 + i * 3) * 1.5) AS b",
        # short vector exercises the size(v) < dim defensive slice
        "transform(sequence(0, 31), i -> sin(id * 13 + i)) AS s",
        "transform(sequence(0, 63), i -> cast(sin(id * 7 + i) as float)) AS f",
    )
    pairs = [
        (V.dot("a", "b"), V.dot(F.col("a"), F.col("b"))),
        (V.l2_norm("a"), V.l2_norm(F.col("a"))),
        (V.cosine_sim("a", "b"), V.cosine_sim(F.col("a"), F.col("b"))),
        (V.as_double("f"), V.as_double(F.col("f"))),
        (V.srp_bucket("a"), V.srp_bucket(F.col("a"))),
        (V.srp_bucket("s"), V.srp_bucket(F.col("s"))),
        (V.srp_bucket_tables("a"), V.srp_bucket_tables(F.col("a"))),
        (V.ivf_centroid_id("a"), V.ivf_centroid_id(F.col("a"))),
        (V.ivf_centroid_topk("a", probes=4), V.ivf_centroid_topk(F.col("a"), probes=4)),
        (V.pq_codes("a"), V.pq_codes(F.col("a"))),
        (
            V.pq_adc_score("a", "codes"),
            V.pq_adc_score(F.col("a"), F.col("codes")),
        ),
    ]
    with_codes = df.withColumn("codes", V.pq_codes(F.col("b")))
    sql_cols = [p[0].alias(f"x{i}") for i, p in enumerate(pairs)]
    col_cols = [p[1].alias(f"x{i}") for i, p in enumerate(pairs)]
    got_sql = with_codes.select(*sql_cols).collect()
    got_col = with_codes.select(*col_cols).collect()
    assert got_sql == got_col


def test_text_sql_forms_match_column_forms(spark):
    """Round-12: text helpers gained the same Column|str dispatch as the
    vector helpers (one F.expr parse instead of per-operator py4j calls).
    Pin SQL form == Column form bit-for-bit, including short docs (< n
    words -> empty shingle array) and the md5/simhash_df internals."""
    df = spark.createDataFrame(
        [
            (1, "  The quick   Brown fox JUMPS over the lazy dog  "),
            (2, "a b"),
            (3, "x y z x y z x y z w"),
            (4, "Unicode åäö ÅÄÖ émigré 文字 文字 emoji 🙂 test here now"),
        ],
        "doc_id long, text string",
    )
    pairs = [
        (T.normalize_text("text"), T.normalize_text(F.col("text"))),
        (T.words("text"), T.words(F.col("text"))),
        (T.shingles(T.words_sql("text")), T.shingles(T.words(F.col("text")))),
    ]
    sql_cols = [p[0].alias(f"x{i}") for i, p in enumerate(pairs)]
    col_cols = [p[1].alias(f"x{i}") for i, p in enumerate(pairs)]
    assert df.select(*sql_cols).collect() == df.select(*col_cols).collect()
    # minhash members over the shingle array
    sh = df.select("doc_id", T.shingles(T.words(F.col("text"))).alias("sh"))
    got_sql = sh.select(*T.minhash_signature("sh", 16)).collect()
    got_col = sh.select(*T.minhash_signature(F.col("sh"), 16)).collect()
    assert got_sql == got_col
    # simhash_df's expr-built internals against the HOF simhash()
    fp = T.simhash_df(df, "doc_id", T.words(F.col("text"))).collect()
    hof = df.select(
        F.col("doc_id"), T.simhash(T.words(F.col("text"))).alias("sig")
    ).collect()
    assert sorted((r.doc_id, r.sig) for r in fp) == sorted(
        (r.doc_id, r.sig) for r in hof
    )
