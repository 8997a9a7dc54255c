"""CDC -> curation capstone (queries/capstone.py): edge proofs beyond the
oracle hash.

The parity test already pins stream-maintained-state == batch-replay at
sf0.001 (and the driver at sf0.01). These tests pin that the stream fold
actually has something to fold — updates, tombstones, both dup kinds —
and that the rate-limited DSv2 drain really was incremental.
"""

from __future__ import annotations

import duckdb
import pytest

from flink_cdc_connectors_spark.queries.capstone import cdc_stream_dedup_index


@pytest.fixture(scope="module")
def capstone_out(spark, sf_dir):
    # one stream run shared by the tests (it boots the streaming engine)
    return cdc_stream_dedup_index(spark, sf_dir).toPandas()


def test_stream_fold_inputs_are_nonvacuous(duck):
    """The tail must contain tombstones AND multi-version keys, or the
    foreachBatch MERGE's remove/replace paths would be dead code."""
    dels, multi = duck.execute(
        """
        WITH mx AS (SELECT max(event_id) AS m FROM events),
        tail AS (
          SELECT e.event_id, e.event_type,
                 e.event_id % greatest(150, (b.m - b.m*8//10)//10) AS dk
          FROM events e, mx b WHERE e.event_id > b.m * 8 // 10)
        SELECT (SELECT count(*) FROM tail WHERE event_type = 'error'),
               (SELECT count(*) FROM (
                  SELECT dk FROM tail GROUP BY dk HAVING count(*) > 1))
        """
    ).fetchone()
    assert dels > 0, "no deletes in the stream window: tombstone path untested"
    assert multi > 0, "no multi-version doc keys: update-replace path untested"


def test_both_dup_kinds_and_both_verdicts_occur(capstone_out):
    """Every verdict path must fire: docs duplicating the stored corpus,
    docs duplicating an earlier stream doc, kept docs, dropped docs."""
    out = capstone_out
    assert (out["n_corpus_dups"] > 0).any(), "no corpus dups planted"
    assert (out["n_stream_dups"] > 0).any(), "no stream-vs-stream dups planted"
    assert set(out["keep"]) == {0, 1}
    # keep is exactly the zero-dup predicate
    assert (
        (out["keep"] == 1)
        == ((out["n_corpus_dups"] == 0) & (out["n_stream_dups"] == 0))
    ).all()


def _state_snapshot(spark, state):
    pdf = (
        spark.read.parquet(state["docs"])
        .selectExpr(
            "doc_id",
            "version",
            "array_sort(sh) AS sh",
            "bands",
        )
        .toPandas()
        .sort_values("doc_id")
    )
    return [
        (r.doc_id, r.version, tuple(r.sh), tuple(r.bands))
        for r in pdf.itertuples(index=False)
    ]


def test_fold_redelivery_is_idempotent(spark, sf_dir, tmp_path):
    """foreachBatch re-runs a batch id after a failure (at-least-once at
    the sink boundary); re-delivering the SAME batch against the already-
    merged state must be a no-op on the index content — the anti-join-
    then-append merge replaces the batch's keys with identical rows."""
    from pyspark.sql import functions as F

    from flink_cdc_connectors_spark.queries.capstone import (
        _CORPUS_N,
        build_corpus_index,
        make_fold,
        _write_state,
    )
    from flink_cdc_connectors_spark.sources.envelope import op_col
    from flink_cdc_connectors_spark.sources.loaders import load_table

    events = load_table(spark, sf_dir, "events")
    m = int(events.agg(F.max("event_id")).first()[0])
    p = m * 8 // 10
    k = max(150, (m - p) // 10)
    corpus = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _CORPUS_N)
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    batch = events.filter(F.col("event_id") > p).select(
        "event_id", op_col().alias("op")
    ).localCheckpoint(eager=True)
    state = {"docs": None, "epoch": 0, "batches": 0, "rows": 0, "hw": -1}
    scratch = str(tmp_path / "idem")
    _write_state(state, scratch, build_corpus_index(corpus))
    fold = make_fold(spark, corpus, k, state, scratch)
    fold(batch, 0)
    first = _state_snapshot(spark, state)
    fold(batch, 0)  # redelivery of the same batch
    second = _state_snapshot(spark, state)
    assert first == second
    assert len(first) > _CORPUS_N  # the merge actually added stream docs


def test_restart_from_checkpoint_resumes_the_drain(spark, sf_dir, tmp_path, duck):
    """Kill the stream after the first increment, restart against the SAME
    checkpoint and index state: the resumed drain must not re-merge the
    first batch (checkpointed offsets) and the final verdicts must equal
    the single-run oracle replay."""
    import os
    import time

    from pyspark.sql import functions as F

    from flink_cdc_connectors_spark.queries.capstone import (
        _CORPUS_N,
        build_corpus_index,
        index_verdicts,
        make_fold,
        _write_state,
    )
    from flink_cdc_connectors_spark.queries.capstone import _duck_capstone_oracle
    from flink_cdc_connectors_spark.sources.ddl import create_cdc_stream
    from flink_cdc_connectors_spark.sources.loaders import load_table
    from tests.oracle_compare import assert_same

    events = load_table(spark, sf_dir, "events")
    m = int(events.agg(F.max("event_id")).first()[0])
    p = m * 8 // 10
    k = max(150, (m - p) // 10)
    batch_size = max(1, (m - p + 2) // 3)
    expected = events.filter(F.col("event_id") > p).count()
    corpus = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _CORPUS_N)
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    state = {"docs": None, "epoch": 0, "batches": 0, "rows": 0, "hw": -1}
    scratch = str(tmp_path / "restart")
    _write_state(state, scratch, build_corpus_index(corpus))
    fold = make_fold(spark, corpus, k, state, scratch)
    ddl = f"""
    CREATE TABLE doc_changelog (event_id BIGINT, user_id BIGINT, value DOUBLE)
    WITH ('connector' = 'mysql-cdc', 'hostname' = 'mysql',
          'username' = 'cdc', 'password' = 'pw',
          'database-name' = 'app', 'table-name' = 'events',
          'scan.startup.mode' = 'specific-offset',
          'scan.startup.specific-offset.pos' = '{p}',
          'debezium.max.batch.size' = '{batch_size}')
    """
    ckpt = os.path.join(scratch, "ckpt")

    def run_until(cond):
        q = (
            create_cdc_stream(spark, ddl, sf_dir)
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            deadline = time.time() + 300
            while not cond():
                assert time.time() < deadline, "drain timed out"
                assert q.isActive, f"stream died: {q.exception()}"
                time.sleep(0.05)
        finally:
            q.stop()

    # phase 1: stop after the FIRST merged increment
    run_until(lambda: state["batches"] >= 1)
    rows_after_kill = state["rows"]
    assert 0 < rows_after_kill < expected, "first run drained everything"
    # phase 2: restart on the same checkpoint; drain the rest. foreachBatch
    # is at-least-once at the offset boundary: if the kill landed between
    # the state write and the offset commit, the restart re-delivers that
    # batch — the merge is idempotent (pinned above), so rows may legally
    # exceed `expected` while the STATE stays exact.  The drain waits on
    # the merged-event high watermark, NOT the row count: a re-delivered
    # batch double-counts rows, and a rows>=expected condition would stop
    # the resumed drain before the true final batch merges (a lost tail).
    run_until(lambda: state["hw"] >= m)
    assert state["rows"] >= expected
    got = index_verdicts(spark.read.parquet(state["docs"])).toPandas()
    want = duck.execute(_duck_capstone_oracle()).fetchdf()
    assert_same(got, want, "restart-resumed capstone")


def test_maintained_state_reflects_tombstones(capstone_out, duck):
    """A doc key whose LAST tail event is a delete must be absent from the
    output (its bands were tombstoned), and every live key present."""
    live = duck.execute(
        """
        WITH mx AS (SELECT max(event_id) AS m FROM events),
        tail AS (
          SELECT e.event_id,
                 CASE WHEN e.event_type = 'signup' THEN 'insert'
                      WHEN e.event_type = 'error' THEN 'delete'
                      ELSE 'update' END AS op,
                 1000000 + e.event_id % greatest(150, (b.m - b.m*8//10)//10) AS dk
          FROM events e, mx b WHERE e.event_id > b.m * 8 // 10),
        folded AS (
          SELECT * FROM (
            SELECT t.*, row_number() OVER (PARTITION BY dk
                                           ORDER BY event_id DESC) rn
            FROM tail t) WHERE rn = 1)
        SELECT dk, op FROM folded
        """
    ).fetchdf()
    dead = set(live[live["op"] == "delete"]["dk"])
    alive = set(live[live["op"] != "delete"]["dk"])
    got = set(capstone_out["doc_id"])
    assert dead, "fixture has no tombstoned keys"
    assert got == alive
    assert not (got & dead)


def test_index_maintained_under_live_log_growth(spark, sf_dir, tmp_path):
    """The flagship composition under LIVE GROWTH: the banded dedup index
    is maintained by rate-limited foreachBatch MERGEs while the changelog
    GROWS mid-drain (refreshLatest tailing — the capture pump keeps
    appending); the maintained state must equal a one-shot fold of the
    whole tail. Proves the index-maintenance path is agnostic to WHEN
    log increments become visible, not just to micro-batch boundaries."""
    import duckdb as _duck

    from pyspark.sql import functions as F

    from flink_cdc_connectors_spark.queries.capstone import (
        _CORPUS_N,
        build_corpus_index,
        make_fold,
        _write_state,
    )
    from flink_cdc_connectors_spark.sources import datasource
    from flink_cdc_connectors_spark.sources.envelope import op_col
    from flink_cdc_connectors_spark.sources.loaders import load_table

    datasource.register(spark)
    events_path = f"{sf_dir}/events.parquet"
    events = load_table(spark, sf_dir, "events")
    m = int(events.agg(F.max("event_id")).first()[0])
    p = m * 8 // 10          # stream startup position
    cut = p + (m - p) // 2   # the log-so-far ends here; the rest "arrives" live
    k = max(150, (m - p) // 10)
    corpus = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _CORPUS_N)
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )

    import os

    staging = str(tmp_path / "staging")
    os.makedirs(staging, exist_ok=True)
    con = _duck.connect()
    con.execute(
        f"COPY (SELECT * FROM '{events_path}' WHERE event_id <= {cut}) "
        f"TO '{staging}/part1.parquet' (FORMAT PARQUET)"
    )

    state = {"docs": None, "epoch": 0, "batches": 0, "rows": 0, "hw": -1}
    scratch = str(tmp_path / "grow")
    _write_state(state, scratch, build_corpus_index(corpus))
    fold = make_fold(spark, corpus, k, state, scratch)

    q = (
        spark.readStream.format("cdc_binlog")
        .option("path", staging)
        .option("startupMode", "specific-offset")
        .option("startupOffset", str(p))
        .option("maxOffsetsPerBatch", max(1, (cut - p + 1) // 2))
        .option("refreshLatest", "true")
        .load()
        .writeStream.foreachBatch(lambda df, bid: fold(df, bid))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        batches_before_growth = state["batches"]
        assert state["hw"] == cut, "log-so-far must drain fully first"
        # the log GROWS mid-drain (the capture pump appends an increment)
        con.execute(
            f"COPY (SELECT * FROM '{events_path}' WHERE event_id > {cut}) "
            f"TO '{staging}/part2.parquet' (FORMAT PARQUET)"
        )
        q.processAllAvailable()
    finally:
        q.stop()
    assert state["hw"] == m, "the grown tail never arrived through the stream"
    assert state["batches"] > batches_before_growth >= 2, (
        "growth must arrive in its own increments, after a rate-limited drain"
    )
    grown = _state_snapshot(spark, state)

    # one-shot replay: fresh corpus index, the WHOLE tail folded as one batch
    batch = events.filter(F.col("event_id") > p).select(
        "event_id", op_col().alias("op")
    ).localCheckpoint(eager=True)
    state2 = {"docs": None, "epoch": 0, "batches": 0, "rows": 0, "hw": -1}
    _write_state(state2, str(tmp_path / "oneshot"), build_corpus_index(corpus))
    make_fold(spark, corpus, k, state2, str(tmp_path / "oneshot"))(batch, 0)
    assert grown == _state_snapshot(spark, state2), (
        "live-growth incremental state diverged from the one-shot fold"
    )
