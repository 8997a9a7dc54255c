"""JDBC chunked snapshot reading — the real database ingestion path.

The reference's snapshot phase reads each key-range chunk with a generated
per-split SELECT (StatementUtils.java:132-225 ``buildSplitScanQuery`` /
``queryNextChunkMax``; executed by MySqlSnapshotSplitReadTask). Spark's
equivalent is ``spark.read.jdbc(url, table, predicates=[...])`` — one
partition per predicate, each executor issuing its own range SELECT, which
is exactly the reference's parallel lock-free chunk scan.

No database server ships in this container, so the module splits into:

  - pure SQL generation (`build_split_scan_query`, `query_min_max_sql`,
    `query_next_chunk_max_sql`) — string-parity with the reference,
    unit-tested;
  - an engine-agnostic lazy boundary walk (`walk_chunk_boundaries`) that
    takes an ``execute(sql) -> scalar`` callable — tested against DuckDB
    standing in for the database;
  - the thin Spark wiring (`read_table_chunked`) that hands the tiled
    predicates to ``spark.read.jdbc`` — the only part that needs a live
    server, and it contains no logic beyond assembling arguments.

Boundary semantics: `chunk_predicates` emits a PROVABLY tiling set —
first ``pk < b₁``, middle ``pk >= bᵢ AND pk < bᵢ₊₁``, last ``pk >= bₙ`` —
every row lands in exactly one partition (asserted in tests).
`build_split_scan_query` mirrors the reference's textual idiom instead
(``<= ? AND NOT (pk = ?)`` fencing, StatementUtils.java:137-176) for
parity checking.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence


def quote(name: str, q: str = "`") -> str:
    """Identifier quoting (StatementUtils.quote:227-233)."""
    return f"{q}{name}{q}"


def query_min_max_sql(table: str, pk: str, q: str = "`") -> str:
    """Boundary discovery: SELECT MIN(pk), MAX(pk) (StatementUtils.java:
    ``queryMinMax``). ``q`` is the dialect's identifier quote (backtick for
    MySQL, double-quote for ANSI/DuckDB)."""
    return f"SELECT MIN({quote(pk, q)}), MAX({quote(pk, q)}) FROM {quote(table, q)}"


def query_next_chunk_max_sql(
    table: str,
    pk: str,
    chunk_size: int,
    lower_bound,
    q: str = "`",
    limit_style: str = "limit",
) -> str:
    """The lazy boundary walk step (StatementUtils.queryNextChunkMax:99-129):
    MAX of the next ``chunk_size`` keys at or above ``lower_bound`` —
    an index-only range scan on the PK, never a full sort.

    ``limit_style``: ``'limit'`` (MySQL/DuckDB ``LIMIT n``) or ``'fetch'``
    (ANSI ``FETCH FIRST n ROWS ONLY`` — Derby, Db2, Oracle 12c+; the
    reference emits the same two shapes per dialect in its
    StatementUtils/dialect classes)."""
    c = quote(pk, q)
    limit = (
        f"LIMIT {chunk_size}"
        if limit_style == "limit"
        else f"FETCH FIRST {chunk_size} ROWS ONLY"
    )
    return (
        f"SELECT MAX({c}) FROM ("
        f"SELECT {c} FROM {quote(table, q)} WHERE {c} >= {lower_bound!r} "
        f"ORDER BY {c} ASC {limit}) AS T"
    )


def build_split_scan_query(
    table: str, pk_cols: Sequence[str], is_first: bool, is_last: bool, q: str = "`"
) -> str:
    """Per-split scan SQL with ``?`` placeholders — the exact condition
    shape of StatementUtils.buildSplitScanQuery/buildSplitQuery:132-176
    (first split: ``pk <= ? AND NOT (pk = ?)``; middle: ``pk >= ? AND NOT
    (pk = ?) AND pk <= ?``; last: ``pk >= ?``; single split: no WHERE)."""

    def cond(op: str) -> str:
        return " AND ".join(f"{quote(c, q)} {op} ?" for c in pk_cols)

    def not_eq() -> str:
        return f"NOT ({cond('=')})"

    if is_first and is_last:
        where = None
    elif is_first:
        where = f"{cond('<=')} AND {not_eq()}"
    elif is_last:
        where = cond(">=")
    else:
        where = f"{cond('>=')} AND {not_eq()} AND {cond('<=')}"
    sql = f"SELECT * FROM {quote(table, q)}"
    return sql if where is None else f"{sql} WHERE {where}"


def walk_chunk_boundaries(
    execute: Callable[[str], object],
    table: str,
    pk: str,
    chunk_size: int,
    max_chunks: int = 1_000_000,
    q: str = "`",
    limit_style: str = "limit",
) -> list:
    """Lazily walk the split boundaries the way the reference's splitter
    does for uneven key distributions (MySqlChunkSplitter.java:159-199:
    repeat ``queryNextChunkMax`` from MIN until past MAX). Returns interior
    boundaries [b₁..bₙ] — ``chunk_predicates`` turns them into n+1 tiles.

    ``execute`` runs one SQL string and returns the scalar result — a JDBC
    round-trip in production, DuckDB in tests. Driver-side cost: one tiny
    index-max query per chunk, never a data scan.
    """
    lo_hi = execute(query_min_max_sql(table, pk, q))
    if isinstance(lo_hi, tuple):
        lo, hi = lo_hi
    else:  # executor returned only min; ask for max separately
        raise ValueError("execute(query_min_max_sql) must return a (min, max) tuple")
    if lo is None:
        return []
    boundaries: list = []
    cur = lo
    for _ in range(max_chunks):
        nxt = execute(query_next_chunk_max_sql(table, pk, chunk_size, cur, q, limit_style))
        if nxt is None or nxt >= hi:
            break
        boundaries.append(nxt)
        cur = nxt
    return boundaries


def chunk_predicates(pk: str, boundaries: Sequence, q: str = "`") -> list[str]:
    """Tiling WHERE-clauses for ``spark.read.jdbc(predicates=...)``:
    one partition per chunk, disjoint and complete over the key space
    (NULL keys are impossible for a primary key)."""
    c = quote(pk, q)
    if not boundaries:
        return [f"{c} IS NOT NULL OR {c} IS NULL"]  # single split: everything
    preds = [f"{c} < {boundaries[0]!r}"]
    preds += [
        f"{c} >= {a!r} AND {c} < {b!r}" for a, b in zip(boundaries, boundaries[1:])
    ]
    preds.append(f"{c} >= {boundaries[-1]!r}")
    return preds


def read_table_chunked(
    spark,
    url: str,
    table: str,
    pk: str,
    boundaries: Sequence,
    properties: dict | None = None,
    q: str = "`",
):
    """The Spark-side chunk scan: one JDBC partition per tiled predicate —
    the declarative analog of the reference's parallel snapshot split read
    (MySqlSnapshotSplitReadTask; split plan from MySqlChunkSplitter).
    Requires a reachable JDBC server (see ``jdbc_live`` for the embedded
    Derby end-to-end path); all planning logic lives in the testable
    helpers above."""
    return spark.read.jdbc(
        url=url,
        table=table,
        predicates=chunk_predicates(pk, boundaries, q=q),
        properties=properties or {},
    )
