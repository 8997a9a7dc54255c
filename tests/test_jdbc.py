"""JDBC chunk-reader planning tests.

No database server ships in the container, so DuckDB stands in as the
"remote database": the SAME SQL strings the JDBC path would issue are
executed against the parquet fixtures, proving the lazy boundary walk and
the predicate tiling end-to-end (reference: StatementUtils.java:99-225,
MySqlChunkSplitter.java:159-199).
"""

from __future__ import annotations

from flink_cdc_connectors_spark.sources.jdbc import (
    build_split_scan_query,
    chunk_predicates,
    query_min_max_sql,
    query_next_chunk_max_sql,
    walk_chunk_boundaries,
)


def _exec(duck):
    def run(sql):
        row = duck.execute(sql).fetchone()
        return row if len(row) > 1 else row[0]

    return run


def test_split_scan_query_shapes():
    """String parity with buildSplitScanQuery (StatementUtils.java:132-176)."""
    assert build_split_scan_query("t", ["id"], True, True) == "SELECT * FROM `t`"
    assert (
        build_split_scan_query("t", ["id"], True, False)
        == "SELECT * FROM `t` WHERE `id` <= ? AND NOT (`id` = ?)"
    )
    assert (
        build_split_scan_query("t", ["id"], False, True)
        == "SELECT * FROM `t` WHERE `id` >= ?"
    )
    assert (
        build_split_scan_query("t", ["id"], False, False)
        == "SELECT * FROM `t` WHERE `id` >= ? AND NOT (`id` = ?) AND `id` <= ?"
    )
    # composite key: the reference ANDs per-column conditions
    assert (
        build_split_scan_query("t", ["a", "b"], False, True)
        == "SELECT * FROM `t` WHERE `a` >= ? AND `b` >= ?"
    )


def test_boundary_walk_matches_chunk_size(duck):
    """Lazy walk over the events fixture: every chunk except the last has
    exactly chunk_size keys; boundaries are strictly increasing."""
    run = _exec(duck)
    n = run('SELECT count(DISTINCT event_id) FROM "events"')
    chunk = max(n // 7, 1)  # ~7 chunks at any fixture scale
    bounds = walk_chunk_boundaries(run, "events", "event_id", chunk, q='"')
    assert bounds == sorted(set(bounds))
    assert len(bounds) == (n - 1) // chunk  # interior boundaries only
    # first chunk = exactly the chunk_size smallest keys
    first = run(f'SELECT count(*) FROM "events" WHERE event_id < {bounds[0]!r}')
    # boundary key itself belongs to the first chunk in reference terms;
    # our tiles put it in the second — either way counts must tile (below).
    assert first in (chunk, chunk - 1)


def test_predicates_tile_the_table(duck):
    """Disjoint + complete: summing per-predicate counts over DuckDB equals
    the table count, and pairwise intersections are empty by construction
    (adjacent half-open ranges)."""
    run = _exec(duck)
    bounds = walk_chunk_boundaries(run, "events", "event_id", 700, q='"')
    preds = chunk_predicates("event_id", bounds, q='"')
    total = sum(
        run(f'SELECT count(*) FROM "events" WHERE {p}') for p in preds
    )
    assert total == run('SELECT count(*) FROM "events"')
    # completeness of the degenerate single-split case too
    (single,) = chunk_predicates("event_id", [], q='"')
    assert run(f'SELECT count(*) FROM "events" WHERE {single}') == total


def test_walk_sql_is_index_range_shaped():
    """The walk must generate the reference's index-friendly shape (MAX over
    an ORDER BY ... LIMIT subquery), not a full-table aggregate."""
    sql = query_next_chunk_max_sql("events", "event_id", 500, 123, q='"')
    assert 'ORDER BY "event_id" ASC LIMIT 500' in sql
    assert sql.startswith('SELECT MAX("event_id") FROM (')
    assert query_min_max_sql("events", "event_id", q='"') == (
        'SELECT MIN("event_id"), MAX("event_id") FROM "events"'
    )
