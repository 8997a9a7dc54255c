"""DuckDB SQL generator for Spark-compatible xxhash64 (XXH64, seed 42).

Purpose: upgrade the two xxhash64-based dedup keys (``ext_dedup_minhash``,
``ext_dedup_simhash``) from rows-only to full DuckDB value oracles.  Their
production hash family is Spark's JVM-native ``F.xxhash64`` — ~10x cheaper
than the md5 family the measurement twins replay — and was pinned
"not SQL-oracle-expressible" since round 3.  It IS expressible: this
module emits a DuckDB expression that reproduces
`org.apache.spark.sql.catalyst.expressions.XXH64` bit-for-bit for UTF-8
string inputs (the full algorithm: 32-byte stripe accumulators, 8-byte /
4-byte / single-byte tails, final avalanche) and for the chained
multi-argument long form Spark uses for band signatures
(``xxhash64(mh0, mh1, mh2, mh3)`` = fold of complete ``hashLong`` calls
with the running hash as the next seed).  Multi-argument
``xxhash64(lit(i), s)`` collapses to a per-member CONSTANT seed
(``hashInt(i, 42)``), precomputed in Python at oracle-build time.

Validated against Spark on 236 string cases (all tail lengths 0..90,
multi-byte UTF-8, every seed family member) and 25 random 4-long chains —
zero mismatches; pinned by tests/test_functions.py.

Construction notes:
- Every sub-expression referenced more than once is wrapped in a
  single-element ``list_transform`` "bind" so the generated SQL stays
  LINEAR in algorithm size instead of exploding combinatorially
  (~13 KB per hash expression).
- All arithmetic is UBIGINT.  DuckDB integer ops ERROR on overflow
  instead of wrapping, and HUGEINT is signed 128-bit (a full 64x64
  product overflows it), so the multiply splits its CONSTANT operand
  into 32-bit halves; adds go through HUGEINT mod 2^64; rotations are
  (constant-multiply mod 2^64) + integer-division (disjoint bit ranges,
  so plain + is exact).
- Sequential folds (stripes, tail chunks) are ``list_reduce`` with the
  seed value prepended as the init element.
"""

P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
M64 = 1 << 64

_ctr = [0]


def _v() -> str:
    _ctr[0] += 1
    return f"x{_ctr[0]}"


import re as _re

# a bare lambda/column variable, optionally with one [k] index — cheap to
# reference twice, so operations on it skip the lambda "bind" (every bind
# is one interpreted list_transform invocation PER ROW at execution time;
# trimming them cut the 16-member minhash oracle's hashing wall ~2x)
_SIMPLE = _re.compile(r"^\(?[A-Za-z_][A-Za-z0-9_]*(\[\d+\])?\)?$")


def _mul(a: str, c) -> str:
    """a * constant c, mod 2^64. HUGEINT is SIGNED 128-bit, so a full
    64x64 product overflows; split the CONSTANT into 32-bit halves:
    a*c = a*c_lo + ((a*c_hi) mod 2^32)*2^32  (mod 2^64), every
    intermediate < 2^97."""
    c = int(c)
    c_lo, c_hi = c & 0xFFFFFFFF, c >> 32

    def body(v: str) -> str:
        return (
            f"(((({v})::HUGEINT * {c_lo}) "
            f"+ (((({v})::HUGEINT * {c_hi}) % {1 << 32}) * {1 << 32})) "
            f"% {M64}::HUGEINT)::UBIGINT"
        )

    if _SIMPLE.match(a):
        return body(a)
    return _bind(a, body)


def _add(a: str, b: str) -> str:
    return f"((({a})::HUGEINT + ({b})::HUGEINT) % {M64}::HUGEINT)::UBIGINT"


def _bind(expr: str, body) -> str:
    """body: callable(varname)->sql. Evaluates expr once."""
    v = _v()
    return f"list_transform([({expr})::UBIGINT], {v} -> {body(v)})[1]"


def _rotl(x: str, r: int) -> str:
    # (x << r | x >> (64-r)) — disjoint bit ranges, plain + is exact
    def body(v: str) -> str:
        return f"({_mul(v, str(1 << r))} + (({v})::UBIGINT // {1 << (64 - r)}))"

    if _SIMPLE.match(x):
        return body(x)
    return _bind(x, body)


def _xor(a: str, b: str) -> str:
    return f"xor(({a})::UBIGINT, ({b})::UBIGINT)"


def _fmix(h: str) -> str:
    s1 = lambda v: _mul(_xor(v, f"({v} // {1<<33})"), str(P2))
    s2 = lambda v: _mul(_xor(v, f"({v} // {1<<29})"), str(P3))
    s3 = lambda v: _xor(v, f"({v} // {1<<32})")
    return _bind(h, lambda v: _bind(s1(v), lambda w: _bind(s2(w), s3)))


def _long8(b: str, i: str) -> str:
    """8-byte little-endian UBIGINT from 1-based byte list `b` at offset
    expression `i` (sum of disjoint byte ranges — exact, no overflow)."""
    return "(" + " + ".join(
        f"{b}[({i})+{k}]*{1 << (8 * k)}" if k else f"{b}[({i})]"
        for k in range(8)
    ) + ")"


def _long4(b: str, i: str) -> str:
    return "(" + " + ".join(
        f"{b}[({i})+{k}]*{1 << (8 * k)}" if k else f"{b}[({i})]"
        for k in range(4)
    ) + ")"


def _sround(acc: str, k: str) -> str:
    # round: acc = rotl(acc + k*P2, 31) * P1
    return _mul(_rotl(_add(acc, _mul(k, str(P2))), 31), str(P1))


def _step8(acc: str, k: str) -> str:
    # h ^= rotl(k*P2,31)*P1 ; h = rotl(h,27)*P1 + P4
    inner = _xor(acc, _mul(_rotl(_mul(k, str(P2)), 31), str(P1)))
    return _add(_mul(_rotl(inner, 27), str(P1)), str(P4))


def duck_xxh64_bytes_sql(b: str, n: str, seed) -> str:
    """XXH64 of the UBIGINT byte-list column `b` (1-based, length `n`)
    with `seed` (an int constant OR a UBIGINT SQL expression — the
    expression form lets ONE generated hash expression serve a whole
    hash FAMILY via a seed column + cross join, which matters because
    DuckDB's binder pays ~5 s per copy of this expression: 17 inlined
    copies cost ~83 s of pure planning, one seed-column copy ~5 s).
    Matches org.apache.spark.sql.catalyst.expressions.XXH64 for UTF-8
    string inputs byte-for-byte."""
    if not isinstance(seed, int):
        sv = _v()
        body = _xxh64_bytes_body(
            b,
            n,
            _add(sv, str((P1 + P2) % M64)),
            _add(sv, str(P2)),
            f"({sv})",
            _add(sv, str((M64 - P1) % M64)),
            _add(sv, str(P5)),
        )
        return f"list_transform([({seed})::UBIGINT], {sv} -> {body})[1]"
    v1i = f"{(seed + P1 + P2) % M64}::UBIGINT"
    v2i = f"{(seed + P2) % M64}::UBIGINT"
    v3i = f"{seed % M64}::UBIGINT"
    v4i = f"{(seed - P1) % M64}::UBIGINT"
    else_init = f"{(seed + P5) % M64}::UBIGINT"
    return _xxh64_bytes_body(b, n, v1i, v2i, v3i, v4i, else_init)


def _xxh64_bytes_body(
    b: str, n: str, v1i: str, v2i: str, v3i: str, v4i: str, else_init: str
) -> str:
    st, acc = _v(), _v()
    stripe_list = (
        f"list_transform(range(0, ({n})//32), {st} -> "
        f"[{_long8(b, f'32*{st}+1')}, {_long8(b, f'32*{st}+9')}, "
        f"{_long8(b, f'32*{st}+17')}, {_long8(b, f'32*{st}+25')}])"
    )
    accs = (
        f"list_reduce(list_concat([[{v1i}, {v2i}, "
        f"{v3i}, {v4i}]], {stripe_list}), "
        f"({acc}, {st}) -> [{_sround(f'{acc}[1]', f'{st}[1]')}, "
        f"{_sround(f'{acc}[2]', f'{st}[2]')}, {_sround(f'{acc}[3]', f'{st}[3]')}, "
        f"{_sround(f'{acc}[4]', f'{st}[4]')}])"
    )

    def _merge(av: str) -> str:
        h0 = _add(
            _add(_rotl(f"{av}[1]", 1), _rotl(f"{av}[2]", 7)),
            _add(_rotl(f"{av}[3]", 12), _rotl(f"{av}[4]", 18)),
        )
        out = h0
        for j in (1, 2, 3, 4):
            out = _bind(
                out,
                lambda hv, j=j: _add(
                    _mul(
                        _xor(hv, _mul(_rotl(_mul(f"{av}[{j}]", str(P2)), 31), str(P1))),
                        str(P1),
                    ),
                    str(P4),
                ),
            )
        return out

    mv = _v()
    h_init = (
        f"(CASE WHEN ({n}) >= 32 THEN "
        f"list_transform([{accs}], {mv} -> {_merge(mv)})[1] "
        f"ELSE {else_init} END)"
    )
    h1 = _bind(h_init, lambda v: _add(v, f"({n})::UBIGINT"))
    a8, t8 = _v(), _v()
    h2 = (
        f"list_reduce(list_concat([({h1})], "
        f"list_transform(range(0, (({n}) - 32*(({n})//32))//8), {t8} -> "
        f"{_long8(b, f'32*(({n})//32) + 8*{t8} + 1')})), "
        f"({a8}, {t8}) -> {_step8(a8, t8)})"
    )
    k4 = _v()
    h3 = _bind(
        h2,
        lambda hv: (
            f"(CASE WHEN ({n}) % 8 >= 4 THEN "
            f"list_transform([{_long4(b, f'8*(({n})//8) + 1')}::UBIGINT], {k4} -> "
            + _add(
                _mul(_rotl(_xor(hv, _mul(k4, str(P1))), 23), str(P2)), str(P3)
            )
            + f")[1] ELSE {hv} END)"
        ),
    )
    ab, tb = _v(), _v()
    # tail bytes: positions 4*((n)//4)+1 .. n  (after the 4-byte chunk if any)
    h4 = (
        f"list_reduce(list_concat([({h3})], "
        f"list_transform(range(4*(({n})//4) + 1, ({n}) + 1), {tb} -> "
        f"{b}[{tb}]::UBIGINT)), "
        f"({ab}, {tb}) -> {_mul(_rotl(_xor(ab, _mul(tb, str(P5))), 11), str(P1))})"
    )
    return _fmix(h4)


def duck_utf8_bytes_sql(s: str) -> str:
    """UBIGINT byte list (1-based) of the UTF-8 encoding of string expr."""
    hx, j = _v(), _v()
    return (
        f"list_transform([hex(encode({s}))], {hx} -> "
        f"list_transform(range(1, length({hx})//2 + 1), {j} -> "
        f"((strpos('0123456789ABCDEF', {hx}[2*{j}-1:2*{j}-1])-1)*16 "
        f"+ (strpos('0123456789ABCDEF', {hx}[2*{j}:2*{j}])-1))::UBIGINT))[1]"
    )


def duck_xxh64_long_sql(l: str, seed_expr: str) -> str:
    """XXH64 of one 8-byte long (UBIGINT expr `l`) with UBIGINT seed expr —
    Spark's XXH64.hashLong: h = seed+P5+8; h ^= rotl(l*P2,31)*P1;
    h = rotl(h,27)*P1+P4; fmix."""
    h0 = _add(seed_expr, str((P5 + 8) % M64))
    h1 = _add(
        _mul(
            _rotl(_xor(h0, _mul(_rotl(_mul(l, str(P2)), 31), str(P1))), 27),
            str(P1),
        ),
        str(P4),
    )
    return _fmix(h1)


def to_signed_sql(u: str) -> str:
    return (
        f"(CASE WHEN ({u}) >= {1<<63}::UBIGINT "
        f"THEN (({u}) - {1<<63}::UBIGINT)::BIGINT + (-{1<<62} - {1<<62}) "
        f"ELSE ({u})::BIGINT END)"
    )


def to_unsigned_sql(s: str) -> str:
    return (
        f"(CASE WHEN ({s}) < 0 THEN (({s}) + {1<<62} + {1<<62})::UBIGINT "
        f"+ {1<<63}::UBIGINT ELSE ({s})::UBIGINT END)"
    )


def _py_rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & (M64 - 1)


def _py_fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) % M64
    h ^= h >> 29
    h = (h * P3) % M64
    h ^= h >> 32
    return h


def spark_seed_for_int(i: int, seed: int = 42) -> int:
    """Spark ``XXH64.hashInt(i, seed)`` — the effective STRING seed of
    ``F.xxhash64(F.lit(i), s)``: multi-arg xxhash64 folds a complete
    per-argument hash with the running hash as the next seed, and the
    IntegerType fast path hashes the 4-byte value.  Plan-time constant
    per hash-family member."""
    h = (seed + P5 + 4) % M64
    h ^= ((i & 0xFFFFFFFF) * P1) % M64
    h = (_py_rotl(h, 23) * P2 + P3) % M64
    return _py_fmix(h)


def _mul_flat(a: str, c) -> str:
    """Like _mul but duplicates the operand TEXT instead of binding —
    for small flat operands over CTE COLUMNS (column references are free
    to repeat; a lambda bind costs one interpreted list_transform PER
    ROW, which is exactly what the staged pipeline exists to avoid)."""
    c = int(c)
    c_lo, c_hi = c & 0xFFFFFFFF, c >> 32
    return (
        f"(((({a})::HUGEINT * {c_lo}) "
        f"+ (((({a})::HUGEINT * {c_hi}) % {1 << 32}) * {1 << 32})) "
        f"% {M64}::HUGEINT)::UBIGINT"
    )


def _rotl_flat(x: str, r: int) -> str:
    return f"({_mul_flat(x, 1 << r)} + (({x})::UBIGINT // {1 << (64 - r)}))"


def duck_xxh64_family_staged_ctes(
    shingle_src: str, seeds: list, out: str
) -> str:
    """Staged-CTE hash-family pipeline: the members ride as parallel
    COLUMNS (one per seed) through flat vectorized stages rather than as
    seed-crossed ROWS (the earlier row-crossed variant, removed once
    both oracles migrated here, paid ~|family|x more per-stage row
    materializations for the same arithmetic) — same arithmetic, but ~|family|x fewer
    per-stage row materializations (measured: the row-crossed form spent
    ~8 s shuffling 280k rows through 13 stages at the 500-doc fixtures;
    the column form threads 16.5k rows).  ``seeds`` is a list of
    (sid, seed_int) pairs — CONSTANT seeds, so each column's init folds
    at build time.  Output CTE: ``{out}(shingle, h_{sid}...)`` with
    signed BIGINT hash columns (sid -1 is emitted as ``h_p``).  Rows with
    n >= 32 are hashed by the general single-expression form through a
    seed-COLUMN cross join over just those rows (one planned copy — 17
    inlined copies cost ~83 s of binder time) and unioned back."""

    def cname(sid: int) -> str:
        return "h_p" if sid < 0 else f"h_{sid}"

    cols = [cname(sid) for sid, _ in seeds]
    # --- per-shingle precompute (seed-independent), n<32 rows only -------
    raw = ", ".join(
        f"CASE WHEN n >= {8 * c} THEN {_long8('b', str(8 * c - 7))} END AS l{c}"
        for c in (1, 2, 3)
    )
    k4 = f"CASE WHEN n % 8 >= 4 THEN {_long4('b', '8*(n//8) + 1')} END AS k4"
    tb = ", ".join(
        f"CASE WHEN n % 4 >= {k} THEN b[4*(n//4) + {k}] END AS rb{k}"
        for k in (1, 2, 3)
    )
    pre0 = (
        f"{out}_p0 AS (SELECT shingle, b, n, {raw}, {k4}, {tb} "
        f"FROM {shingle_src} WHERE n < 32)"
    )
    terms = ", ".join(
        f"{_mul_flat(_rotl_flat(_mul_flat(f'l{c}', P2), 31), P1)} AS tl{c}"
        for c in (1, 2, 3)
    )
    pre1 = (
        f"{out}_p1 AS (SELECT shingle, n, {terms}, "
        f"{_mul_flat('k4', P1)} AS u4, "
        + ", ".join(f"{_mul_flat(f'rb{k}', P5)} AS p{k}" for k in (1, 2, 3))
        + f" FROM {out}_p0)"
    )
    pend = ["tl1", "tl2", "tl3", "u4", "p1", "p2", "p3"]
    inits = ", ".join(
        f"{_add(str((sd + P5) % M64), '(n)::UBIGINT')} AS {cname(sid)}"
        for sid, sd in seeds
    )
    stages = [
        f"{out}_s0 AS (SELECT shingle, n, {', '.join(pend)}, {inits} "
        f"FROM {out}_p1)"
    ]

    def stage(idx: int, cond: str, make_expr, consumed) -> None:
        prev = f"{out}_s{idx - 1}"
        if consumed:
            pend.remove(consumed)
        keep = ", ".join(["shingle", "n"] + pend)
        reps = ", ".join(
            f"(CASE WHEN {cond} THEN {make_expr(c)} ELSE {c} END) AS {c}"
            for c in cols
        )
        stages.append(f"{out}_s{idx} AS (SELECT {keep}, {reps} FROM {prev})")

    i = 1
    for c8 in (1, 2, 3):
        stage(
            i,
            f"n >= {8 * c8}",
            lambda c, c8=c8: _add(
                _mul_flat(_rotl_flat(f"xor({c}, tl{c8})", 27), P1), str(P4)
            ),
            f"tl{c8}",
        )
        i += 1
    stage(
        i,
        "n % 8 >= 4",
        lambda c: _add(_mul_flat(_rotl_flat(f"xor({c}, u4)", 23), P2), str(P3)),
        "u4",
    )
    i += 1
    for k in (1, 2, 3):
        stage(
            i,
            f"n % 4 >= {k}",
            lambda c, k=k: _mul_flat(_rotl_flat(f"xor({c}, p{k})", 11), P1),
            f"p{k}",
        )
        i += 1
    f1 = lambda c: _mul_flat(f"xor({c}, {c} // {1 << 33})", P2)
    stage(
        i,
        "TRUE",
        lambda c: _mul_flat(f"xor({f1(c)}, {f1(c)} // {1 << 29})", P3),
        None,
    )
    i += 1
    stage(i, "TRUE", lambda c: f"xor({c}, {c} // {1 << 32})", None)
    i += 1
    last = f"{out}_s{i - 1}"
    short = (
        f"{out}_short AS (SELECT shingle, "
        + ", ".join(f"{to_signed_sql(c)} AS {c}" for c in cols)
        + f" FROM {last})"
    )
    # --- n >= 32 fallback: general expression, seed-column form ----------
    seed_rows = ", ".join(f"({sid}, {sd}::UBIGINT)" for sid, sd in seeds)
    general = to_signed_sql(duck_xxh64_bytes_sql("b", "n", "sd"))
    fb = (
        f"{out}_fbseeds(sid, sd) AS (VALUES {seed_rows}), "
        f"{out}_fb AS (SELECT shingle, sid, {general} AS hv "
        f"FROM (SELECT shingle, b, n FROM {shingle_src} WHERE n >= 32) "
        f"CROSS JOIN {out}_fbseeds), "
        f"{out}_fbp AS (SELECT shingle, "
        + ", ".join(
            f"min(hv) FILTER (sid = {sid}) AS {cname(sid)}" for sid, _ in seeds
        )
        + f" FROM {out}_fb GROUP BY shingle)"
    )
    final = (
        f"{out} AS (SELECT * FROM {out}_short "
        f"UNION ALL SELECT * FROM {out}_fbp)"
    )
    return ",\n".join([pre0, pre1] + stages + [short, fb, final])
