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
