"""Vector functions over array<float|double> embedding columns.

Higher-order array functions (zip_with / aggregate) — JVM-side, codegen'd,
no Python. The reference has no vector surface; these back the Tier C
similarity-search operators (SURVEY.md §2.C).
"""

from __future__ import annotations

import sys
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

# Executor closures in the GEMM scale paths (tier_c / tier_c_ext3 /
# tier_c_ext4) capture round_half_up6 below; a plain module-level function
# pickles BY REFERENCE, so Python workers launched outside the repo
# (driver cwd elsewhere, no PYTHONPATH — exactly how the driver runs the
# contract) fail with ModuleNotFoundError.  Ship this module BY VALUE
# inside any pickle that references it — the same self-containment fix as
# sources/datasource.py::register and functions/spatial.py (caught by the
# round-11 foreign-cwd driver simulation: ext_dedup_embedding /
# ext_semdedup red from /tmp, green from the repo root).
try:  # driver-side only; harmless if cloudpickle's layout ever changes
    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover - defensive: never block imports
    pass


# ---------------------------------------------------------------------------
# Column | str dispatch (round 12).  Every public constructor below accepts
# either a Column or a Spark-SQL expression STRING (typically a column name).
# A str argument routes through the *_sql builders and ONE F.expr call; the
# Column path builds the same tree through the HOF API.  Both yield the
# IDENTICAL Catalyst expression (same functions, literals and lambda
# structure — A/B pinned in tests/test_functions.py), so values never
# change.  Why it exists: each Column/HOF constructor pays one py4j round
# trip per operator (~0.3 ms on the bench box), so ONE dot() costs ~9-23 ms
# of driver time before any job runs, and the ANN/vector builders construct
# dozens per TIMED bench run — profiled at ~2.4 s/run of pure plan
# construction in ext_ann_recall.  The SQL string parses in the JVM in ~1 ms.
# ---------------------------------------------------------------------------


def dot_sql(a: str, b: str) -> str:
    """Spark-SQL form of :func:`dot` — same zip_with/aggregate structure."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D,"
        " (acc, x) -> acc + x)"
    )


def l2_norm_sql(v: str) -> str:
    return f"sqrt({dot_sql(v, v)})"


def cosine_sim_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({l2_norm_sql(a)} * {l2_norm_sql(b)}))"


def _as_expr(x: Column | str) -> Column:
    """MIXED str/Column two-arg calls (ADVICE r12 #3): in this module a str
    argument means a SQL *fragment* (the single-parse contract), but the
    HOF fallback path would hand it to functions like ``F.zip_with`` where
    a bare str means a column NAME — so ``dot("slice(v,1,8)", col)``
    silently misbinds instead of parsing.  Wrap leftover str args in
    ``F.expr`` so the fragment contract holds for every arity."""
    return F.expr(x) if isinstance(x, str) else x


def as_double(v: Column | str) -> Column:
    if isinstance(v, str):
        return F.expr(f"transform({v}, x -> cast(x as double))")
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(dot_sql(a, b))
    a, b = _as_expr(a), _as_expr(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(v: Column | str) -> Column:
    if isinstance(v, str):
        return F.expr(l2_norm_sql(v))
    return F.sqrt(dot(v, v))


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(cosine_sim_sql(a, b))
    a, b = _as_expr(a), _as_expr(b)
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _hash_coef(salt: str, idx: int) -> float:
    """Deterministic pseudo-random coefficient in [-0.5, 0.5) — stable
    across runs/processes (md5-derived, no RNG state)."""
    import hashlib

    h = hashlib.md5(f"{salt}:{idx}".encode()).digest()
    return int.from_bytes(h[:8], "big") % 10_000 / 10_000.0 - 0.5


@lru_cache(maxsize=None)
def _coef_sql(salt: str, dim: int) -> str:
    """One plane/centroid as a SQL array literal string. The coefficients
    are exact 4-decimal doubles, so their repr round-trips bit-exactly
    through the SQL parser."""
    return "array(" + ",".join(f"{_hash_coef(salt, i)!r}D" for i in range(dim)) + ")"


@lru_cache(maxsize=None)
def _planes_sql(salts: tuple, dim: int) -> str:
    """All planes/centroids of a family as ONE nested SQL array literal.

    Built as a single ``F.expr`` string rather than nested ``F.lit`` /
    ``F.array`` calls: PySpark's ``lit`` on a list round-trips py4j once
    PER ELEMENT, so 16 centroids x 64 dims cost ~1k gateway calls — the
    measured build-time of the ANN queries was ~7 s of driver socket
    chatter before this (cProfile: 32k ``send_command`` calls in
    ext_ann_recall alone). One expr string is one gateway call."""
    return "array(" + ",".join(_coef_sql(s, dim) for s in salts) + ")"


def srp_bucket_sql(v: str, num_planes: int = 8, dim: int = 64) -> str:
    """Spark-SQL form of :func:`srp_bucket` (same tree, one expr parse)."""
    planes = _planes_sql(tuple(f"srp{p}" for p in range(num_planes)), dim)
    pv = f"CASE WHEN size({v}) >= {dim} THEN p ELSE slice(p, 1, size({v})) END"
    bit = f"CASE WHEN {dot_sql(v, pv)} >= 0 THEN '1' ELSE '0' END"
    return f"array_join(transform({planes}, p -> {bit}), '')"


def srp_bucket(v: Column | str, num_planes: int = 8, dim: int = 64) -> Column:
    """Sign-random-projection LSH bucket: the sign pattern of ``v`` against
    ``num_planes`` deterministic hyperplanes. Vectors with high cosine
    similarity collide with high probability. ``dim`` must be >= the vector
    length; coefficients are sliced to the vector's size (zip_with would
    null-pad a length mismatch, poisoning the sum). The plane loop is a
    ``transform`` over one nested literal — constant-size expression tree
    regardless of plane count."""
    if isinstance(v, str):
        return F.expr(srp_bucket_sql(v, num_planes, dim))
    planes = F.expr(_planes_sql(tuple(f"srp{p}" for p in range(num_planes)), dim))

    def bit(p):
        # Skip the defensive slice when the vector already spans the full
        # plane (the common case): slice(p, 1, dim) == p there, and the
        # per-plane 64-double array copy it avoids is ~10% of the whole
        # bucket projection at corpus scale. Result is bit-identical —
        # same elements, same left-to-right sum order.
        pv = F.when(F.size(v) >= dim, p).otherwise(
            F.slice(p, F.lit(1), F.size(v))
        )
        return F.when(dot(v, pv) >= 0, "1").otherwise("0")

    return F.array_join(F.transform(planes, bit), "")


def srp_bucket_tables_sql(
    v: str, num_tables: int = 4, num_planes: int = 5, dim: int = 64
) -> str:
    """Spark-SQL form of :func:`srp_bucket_tables` (same tree)."""
    tables = (
        "array("
        + ",".join(
            _planes_sql(
                tuple(f"srp{t * num_planes + p}" for p in range(num_planes)), dim
            )
            for t in range(num_tables)
        )
        + ")"
    )
    bit = (
        f"CASE WHEN {dot_sql(v, f'slice(p, 1, size({v}))')} >= 0"
        " THEN '1' ELSE '0' END"
    )
    return (
        f"transform({tables}, (tp, ti) -> concat_ws(':', cast(ti as string),"
        f" array_join(transform(tp, p -> {bit}), '')))"
    )


def srp_bucket_tables(
    v: Column | str, num_tables: int = 4, num_planes: int = 5, dim: int = 64
) -> Column:
    """Multi-TABLE SRP-LSH: ``num_tables`` independent bucket ids per
    vector (array<string> "t:bits"). Union-of-tables candidate generation
    is the standard LSH recall lever: recall rises with the number of
    tables and with FEWER planes per table (coarser buckets — higher
    collision probability, more candidates per bucket); cost is the probed
    corpus fraction. The defaults (4 tables x 5 planes = 32 buckets each)
    probe ~4/32 of the corpus."""
    if isinstance(v, str):
        return F.expr(srp_bucket_tables_sql(v, num_tables, num_planes, dim))
    tables = F.expr(
        "array("
        + ",".join(
            _planes_sql(
                tuple(f"srp{t * num_planes + p}" for p in range(num_planes)), dim
            )
            for t in range(num_tables)
        )
        + ")"
    )
    return F.transform(
        tables,
        lambda tp, ti: F.concat_ws(
            ":",
            ti.cast("string"),
            F.array_join(
                F.transform(
                    tp,
                    lambda p: F.when(
                        dot(v, F.slice(p, F.lit(1), F.size(v))) >= 0, "1"
                    ).otherwise("0"),
                ),
                "",
            ),
        ),
    )


def _centroids(num_centroids: int, dim: int) -> Column:
    return F.expr(_planes_sql(tuple(f"ivf{c}" for c in range(num_centroids)), dim))


def _ivf_scores_sql(v: str, num_centroids: int, dim: int) -> str:
    """Spark-SQL array of ``v``'s dot products against the IVF family."""
    cents = _planes_sql(tuple(f"ivf{c}" for c in range(num_centroids)), dim)
    return f"transform({cents}, p -> {dot_sql(v, f'slice(p, 1, size({v}))')})"


def ivf_centroid_topk_sql(
    v: str, probes: int = 4, num_centroids: int = 16, dim: int = 64
) -> str:
    """Spark-SQL form of :func:`ivf_centroid_topk` (same tree)."""
    cents = _planes_sql(tuple(f"ivf{c}" for c in range(num_centroids)), dim)
    scored = (
        f"transform({cents}, (p, i) -> struct("
        f"{dot_sql(v, f'slice(p, 1, size({v}))')} AS s, cast(i as int) AS c))"
    )
    return (
        f"transform(slice(sort_array({scored}, false), 1, {probes}), x -> x.c)"
    )


def ivf_centroid_topk(
    v: Column | str, probes: int = 4, num_centroids: int = 16, dim: int = 64
) -> Column:
    """Multi-PROBE IVF: the ``probes`` closest pseudo-centroids for a query
    vector (array<int>), by dot-product score. Probing P cells raises the
    candidate fraction to P/num_centroids — the IVF nprobe knob (FAISS
    semantics): recall scales with the probed fraction, cost stays one
    broadcast join on cell id."""
    if isinstance(v, str):
        return F.expr(ivf_centroid_topk_sql(v, probes, num_centroids, dim))
    scored = F.transform(
        _centroids(num_centroids, dim),
        lambda p, i: F.struct(
            dot(v, F.slice(p, F.lit(1), F.size(v))).alias("s"),
            i.cast("int").alias("c"),
        ),
    )
    top = F.slice(F.sort_array(scored, asc=False), 1, probes)
    return F.transform(top, lambda x: x["c"])


def _pq_centroids_sql(sub: int, k: int, sub_dim: int) -> str:
    """The ``k`` pseudo-centroids of one PQ subspace as a nested SQL array
    literal (same deterministic md5-derived coefficients as the IVF/SRP
    families, distinct salt namespace)."""
    return _planes_sql(tuple(f"pq{sub}x{c}" for c in range(k)), sub_dim)


def _pq_sq_norm(sub: int, c: int, sub_dim: int) -> float:
    """Plan-time squared L2 norm of one PQ centroid — folded into the
    argmin-L2 score so the per-row work is K dot products, not K norms."""
    return sum(_hash_coef(f"pq{sub}x{c}", i) ** 2 for i in range(sub_dim))


def pq_codes_sql(v: str, m: int = 8, k: int = 16, dim: int = 64) -> str:
    """Spark-SQL form of :func:`pq_codes` (same tree)."""
    sub_dim = dim // m
    parts = []
    for s in range(m):
        cents = _pq_centroids_sql(s, k, sub_dim)
        subv = f"slice({v}, {s * sub_dim + 1}, {sub_dim})"
        half = (
            "array("
            + ",".join(f"{_pq_sq_norm(s, c, sub_dim) / 2.0!r}D" for c in range(k))
            + ")"
        )
        scores = (
            f"zip_with(transform({cents}, p -> {dot_sql(subv, 'p')}),"
            f" {half}, (d, h) -> d - h)"
        )
        parts.append(
            f"cast((array_position({scores}, array_max({scores})) - 1) as int)"
        )
    return "array(" + ",".join(parts) + ")"


def pq_codes(v: Column | str, m: int = 8, k: int = 16, dim: int = 64) -> Column:
    """Product-quantization encode: split ``v`` into ``m`` subvectors of
    ``dim/m`` dims and assign each to its nearest (L2) of ``k``
    deterministic pseudo-centroids. Returns ``array<int>`` of ``m`` codes —
    the 100 TB compression step: downstream ANN stages shuffle/score these
    ``m``-byte codes instead of the full vector (64 doubles -> 8 codes is a
    64x payload cut). argmin ||x-c||^2 == argmax (x.c - ||c||^2/2); the
    ``||c||^2/2`` terms are plan-time Python constants, so the per-row cost
    is m*k short dot products over literal arrays (no RNG, no training —
    the same no-training tradeoff as ``ivf_centroid_id``, recall measured
    by ``ext_ann_recall``)."""
    if isinstance(v, str):
        return F.expr(pq_codes_sql(v, m, k, dim))
    sub_dim = dim // m
    parts = []
    for s in range(m):
        cents = F.expr(_pq_centroids_sql(s, k, sub_dim))
        subv = F.slice(v, s * sub_dim + 1, sub_dim)
        half_norms = F.expr(
            "array(" + ",".join(f"{_pq_sq_norm(s, c, sub_dim) / 2.0!r}D" for c in range(k)) + ")"
        )
        scores = F.zip_with(
            F.transform(cents, lambda p: dot(subv, p)),  # noqa: B023
            half_norms,
            lambda d, h: d - h,
        )
        parts.append((F.array_position(scores, F.array_max(scores)) - 1).cast("int"))
    return F.array(*parts)


def round_half_up6(a):
    """Spark-``F.round(x, 6)``-compatible rounding over a float64 ndarray —
    closes the GEMM-ROUNDING-NOTE caveat (VERDICT r10 #5): the numpy scale
    paths previously used ``np.round`` (round-half-EVEN over the binary
    double) while the sub-gate join forms use Spark's round (BigDecimal
    HALF_UP over the double's shortest decimal repr, via
    ``BigDecimal.valueOf``), so a score within ~1 ulp of a 6-decimal
    half-boundary could round differently across the engine gate and flip
    a top-k tie-break.

    Exact emulation, vectorized: round-to-nearest modes can only disagree
    AT a half-boundary tie, so ``rint(x*1e6)/1e6`` (half-even) already
    equals HALF_UP for every element except those whose scaled value sits
    within binary noise (~1e-9) of a half-integer — including the ones
    whose SHORTEST DECIMAL REPR is exactly on the boundary while the
    binary double is infinitesimally off.  Those band elements (4 of
    2.4M on real sf10 score matrices; often zero) are re-rounded exactly
    through ``decimal.Decimal(repr(x))`` — the same shortest-repr decimal
    Java's ``Double.toString`` feeds ``BigDecimal.valueOf``.  NaN passes
    through (comparisons push NaN out of every top-k anyway).
    Boundary-exact parity against Spark is pinned in
    tests/test_functions.py::test_round_half_up6_matches_spark_round.

    Validity bound (ADVICE r11, tightened round 12): the band detector
    compares against an ABSOLUTE 1e-6 threshold on the x*1e6-scaled
    value, which is sound only while the scaled representation error
    (~1.5 * ulp(x*1e6): half an ulp from the multiply plus the double's
    own scaled repr error) stays below 1e-6.  The guard bounds
    |x*1e6| <= 1e9, where ulp = 1.2e-7 gives a ~5x worst-case margin at
    the edge and ~8000x at |x| <= 1 (the first guard shipped 1e12 =
    |x| <= 1e6, which admits real misses: 17083.4064815 scales to ulp
    1.9e-6 > the band, silently rounding half-even).  Every in-repo
    caller feeds cosine/ADC similarity scores (|x| <= a few), far inside
    the domain; the guard below rejects out-of-domain magnitudes instead
    of mis-rounding them."""
    import numpy as np

    a = np.asarray(a, dtype=np.float64)
    # Fast path: rint (round-half-even) equals HALF_UP for every element
    # NOT within binary noise of a half-boundary — the two modes can only
    # disagree AT a tie, and a float64 product is exactly .5e-6 off a
    # 6-decimal grid point only inside a ~1e-9-wide band.  So rint
    # everything, then re-round just the band elements exactly.  The pass
    # structure is deliberately in-place-heavy: the first version of this
    # helper (abs/floor/copysign + a second floor for the band mask, ~10
    # full-matrix passes and 7 temporaries) measured 2-4x on
    # ext_semdedup's per-cell n^2 sims matrix at the 100x corpus — the
    # rounding pass must stay O(np.round)-ish because the GEMM it follows
    # is BLAS-fast.
    s = a * 1e6  # temp 1
    r = np.rint(s)  # temp 2
    with np.errstate(invalid="ignore"):
        # band detector, reusing s as scratch: |(|s - r|) - 0.5| < 1e-6
        # (elements whose fractional part sits within noise of .5)
        np.subtract(s, r, out=s)
        np.abs(s, out=s)
        np.subtract(s, 0.5, out=s)
        np.abs(s, out=s)
        near = s < 1e-6  # bool temp
    # Domain guard (ADVICE r11): two allocation-free reductions over the
    # already-materialized r (= rint(x*1e6)); 1e9 scaled = |x| <= 1e3,
    # the largest decade where 1.5*ulp (~1.8e-7) stays under the 1e-6
    # band with margin — see the docstring for the 1e12-bound miss.
    if r.size and (np.nanmax(r) > 1e9 or np.nanmin(r) < -1e9):
        raise ValueError(
            "round_half_up6: |x| > 1e3 is outside the half-boundary "
            "detector's validity domain (see docstring); use Spark-side "
            "F.round for large-magnitude columns"
        )
    # divide by the EXACT double 1e6 — multiplying by the inexact 1e-6
    # lands one ulp off the decimal value (e.g. -122243*1e-6 !=
    # -122243/1e6) and would diverge from BigDecimal's toDouble
    np.divide(r, 1e6, out=r)
    if near.any():
        from decimal import ROUND_HALF_UP, Decimal

        q = Decimal("1e-6")
        flat_r, flat_a = r.reshape(-1), a.reshape(-1)
        for i in np.nonzero(near.reshape(-1))[0]:
            flat_r[i] = float(
                Decimal(repr(float(flat_a[i]))).quantize(q, rounding=ROUND_HALF_UP)
            )
    return r


def srp_planes_np(num_planes: int = 8, dim: int = 64):
    """The SRP hyperplane family as a numpy ``(num_planes, dim)`` float64
    array — the same ``_hash_coef`` constants as ``srp_bucket``'s literal
    arrays (plane i is salt ``srp{i}`` in both forms), for the batched
    bucket-assign in the embedding-LSH scale modes. Sign decisions match
    the Column form exactly: both compute dot(v, plane) and test >= 0,
    and the hash-derived coefficients keep |dot| far from the fp-noise
    floor (pinned by the helper-level A/B in tests/test_plan_audits.py)."""
    import numpy as np

    return np.array(
        [[_hash_coef(f"srp{p}", i) for i in range(dim)] for p in range(num_planes)],
        dtype=np.float64,
    )


def ivf_centroids_np(num_centroids: int = 16, dim: int = 64):
    """The IVF centroid family as a numpy ``(num_centroids, dim)`` float64
    array — the same ``_hash_coef`` constants as ``ivf_centroid_id``'s
    literal arrays, for the numpy encode path (``ext_sim_search_pq`` scale
    mode). Both engines take the FIRST argmax (``array_position`` of
    ``array_max`` / ``np.argmax``), so cell assignment matches exactly."""
    import numpy as np

    return np.array(
        [[_hash_coef(f"ivf{c}", i) for i in range(dim)] for c in range(num_centroids)],
        dtype=np.float64,
    )


def pq_centroids_np(m: int = 8, k: int = 16, dim: int = 64):
    """The PQ codebook family as a numpy ``(m, k, dim/m)`` float64 array —
    the SAME ``_hash_coef`` constants the Column/DuckDB forms inline as
    literals (``_pq_centroids_sql`` / ``duck_pq_codes_sql``), exported for
    the GEMM-per-cell ADC path in ``ext_sim_search_pq`` scale mode. The
    three representations are bit-identical doubles (4-decimal-exact
    values whose repr round-trips), so a numpy lookup-table score and the
    expression-fold score agree to summation-order fp noise, which the
    shared round-to-6 absorbs."""
    import numpy as np

    sub_dim = dim // m
    return np.array(
        [
            [[_hash_coef(f"pq{s}x{c}", i) for i in range(sub_dim)] for c in range(k)]
            for s in range(m)
        ],
        dtype=np.float64,
    )


def pq_adc_score_sql(
    qv: str, codes: str, m: int = 8, k: int = 16, dim: int = 64
) -> str:
    """Spark-SQL form of :func:`pq_adc_score` (same tree)."""
    sub_dim = dim // m
    terms = []
    for s in range(m):
        cents = _pq_centroids_sql(s, k, sub_dim)
        subq = f"slice({qv}, {s * sub_dim + 1}, {sub_dim})"
        terms.append(
            dot_sql(subq, f"element_at({cents}, element_at({codes}, {s + 1}) + 1)")
        )
    return "(" + " + ".join(terms) + ")"


def pq_adc_score(
    qv: Column | str, codes: Column | str, m: int = 8, k: int = 16, dim: int = 64
) -> Column:
    """Asymmetric-distance (ADC) inner-product score of a QUERY vector
    against a corpus vector's PQ ``codes``: sum over subspaces of
    dot(query_subvector, centroid[code]). The query side computes its m x k
    lookup table once per row from literal centroid arrays; the corpus side
    contributes only its codes — this is how FAISS IVF-PQ scores candidates
    without touching the raw corpus vectors."""
    if isinstance(qv, str) and isinstance(codes, str):
        return F.expr(pq_adc_score_sql(qv, codes, m, k, dim))
    qv, codes = _as_expr(qv), _as_expr(codes)
    sub_dim = dim // m
    terms = []
    for s in range(m):
        cents = F.expr(_pq_centroids_sql(s, k, sub_dim))
        subq = F.slice(qv, s * sub_dim + 1, sub_dim)
        terms.append(dot(subq, F.element_at(cents, F.element_at(codes, s + 1) + 1)))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


# --- DuckDB oracle fragments -------------------------------------------------
# The SRP/IVF/PQ structures are built from PLAN-TIME literal coefficient
# arrays (_hash_coef above — pure Python, no Spark involved), so the exact
# same constants can be inlined into DuckDB oracle SQL: the oracle replays
# the identical bucket/cell assignment and the driver's value-hash check
# covers the full ANN pipeline, not just a rows-only count. Coefficients
# are 4-decimal exact doubles; both engines parse the same literal text to
# the same double, and both compute list/array dot products in element
# order, so bucket signs and cell argmaxes agree bit-for-bit (score gaps
# are ~1e-2 vs fp noise ~1e-15).


def _duck_plane(salt: str, dim: int) -> str:
    """One plane/centroid as a DuckDB DOUBLE[] literal — same constants as
    the Spark-side ``_coef_sql`` literal for the same salt."""
    return "[" + ",".join(f"{_hash_coef(salt, i)!r}" for i in range(dim)) + "]::DOUBLE[]"


def duck_srp_bucket_sql(col: str, num_planes: int = 8, dim: int = 64) -> str:
    """DuckDB expression mirroring ``srp_bucket``: the '0'/'1' sign pattern
    of ``col`` (a DOUBLE[] expression) against the same literal planes."""
    cases = [
        f"CASE WHEN list_dot_product({col}, ({_duck_plane(f'srp{p}', dim)})[1:len({col})]) >= 0 "
        "THEN '1' ELSE '0' END"
        for p in range(num_planes)
    ]
    return "concat(" + ",".join(cases) + ")"


def duck_ivf_scores_sql(col: str, num_centroids: int = 16, dim: int = 64) -> str:
    """DuckDB DOUBLE[] of ``col``'s dot products against the IVF centroid
    family — input to both the argmax cell id and the top-P probe list."""
    dots = [
        f"list_dot_product({col}, ({_duck_plane(f'ivf{c}', dim)})[1:len({col})])"
        for c in range(num_centroids)
    ]
    return "[" + ",".join(dots) + "]"


def duck_ivf_probe_structs_sql(col: str, num_centroids: int = 16, dim: int = 64) -> str:
    """DuckDB list of {s, c} structs (score, 0-based cell) mirroring the
    scored centroid array inside ``ivf_centroid_topk`` — unnest + window
    rank replays the top-P probe selection."""
    items = [
        f"struct_pack(s := list_dot_product({col}, ({_duck_plane(f'ivf{c}', dim)})[1:len({col})]), "
        f"c := {c})"
        for c in range(num_centroids)
    ]
    return "[" + ",".join(items) + "]"


def duck_ivf_cell_sql(col: str, num_centroids: int = 16, dim: int = 64) -> str:
    """DuckDB expression mirroring ``ivf_centroid_id``: first-argmax cell id
    (0-based INT) over the same literal centroids."""
    scores = duck_ivf_scores_sql(col, num_centroids, dim)
    return (
        f"CAST(list_position({scores}, list_aggregate({scores}, 'max')) - 1 AS INT)"
    )


def duck_srp_table_bucket_sqls(
    col: str, num_tables: int = 4, num_planes: int = 5, dim: int = 64
) -> list[str]:
    """Per-table DuckDB bucket expressions mirroring ``srp_bucket_tables``:
    one ``'t:bits'`` string per table from the same literal plane family."""
    out = []
    for t in range(num_tables):
        cases = [
            f"CASE WHEN list_dot_product({col}, "
            f"({_duck_plane(f'srp{t * num_planes + p}', dim)})[1:len({col})]) >= 0 "
            "THEN '1' ELSE '0' END"
            for p in range(num_planes)
        ]
        out.append(f"concat('{t}', ':', " + ",".join(cases) + ")")
    return out


def duck_pq_codes_sql(col: str, m: int = 8, k: int = 16, dim: int = 64) -> str:
    """DuckDB INT list mirroring ``pq_codes``: per subspace, first-argmax of
    (dot(subvector, centroid) - ||centroid||^2/2) over the same literal
    codebooks and half-norm constants."""
    sub_dim = dim // m
    codes = []
    for s in range(m):
        sub = f"{col}[{s * sub_dim + 1}:{(s + 1) * sub_dim}]"
        scores = (
            "["
            + ",".join(
                f"list_dot_product({sub}, {_duck_plane(f'pq{s}x{c}', sub_dim)}) "
                f"- {_pq_sq_norm(s, c, sub_dim) / 2.0!r}"
                for c in range(k)
            )
            + "]"
        )
        codes.append(
            f"CAST(list_position({scores}, list_aggregate({scores}, 'max')) - 1 AS INT)"
        )
    return "[" + ",".join(codes) + "]"


def duck_pq_adc_sql(
    qcol: str, codes_col: str, m: int = 8, k: int = 16, dim: int = 64
) -> str:
    """DuckDB expression mirroring ``pq_adc_score``: sum over subspaces of
    dot(query subvector, centroid[code]) from the same literal codebooks."""
    sub_dim = dim // m
    terms = []
    for s in range(m):
        subq = f"{qcol}[{s * sub_dim + 1}:{(s + 1) * sub_dim}]"
        cents = "[" + ",".join(_duck_plane(f"pq{s}x{c}", sub_dim) for c in range(k)) + "]"
        terms.append(f"list_dot_product({subq}, ({cents})[{codes_col}[{s + 1}] + 1])")
    return "(" + " + ".join(terms) + ")"


def ivf_centroid_id_sql(v: str, num_centroids: int = 16, dim: int = 64) -> str:
    """Spark-SQL form of :func:`ivf_centroid_id` (same tree)."""
    scores = _ivf_scores_sql(v, num_centroids, dim)
    return f"cast((array_position({scores}, array_max({scores})) - 1) as int)"


def ivf_centroid_id(
    v: Column | str, num_centroids: int = 16, dim: int = 64
) -> Column:
    """IVF-style coarse quantization without training: assign each vector
    to the deterministic pseudo-centroid with the highest dot product.

    A real IVF trains centroids with k-means; at ingest scale a fixed
    hash-derived codebook gives the same *pruning structure* (each query
    probes its top cells only) with zero training passes — the tradeoff is
    recall, tuned by probing more cells. Centroid coefficients are literal
    arrays (plan-time constants), so the per-row cost is ``num_centroids``
    dot products."""
    if isinstance(v, str):
        return F.expr(ivf_centroid_id_sql(v, num_centroids, dim))
    scores = F.transform(
        _centroids(num_centroids, dim),
        lambda p: dot(v, F.slice(p, F.lit(1), F.size(v))),
    )
    return (F.array_position(scores, F.array_max(scores)) - 1).cast("int")
