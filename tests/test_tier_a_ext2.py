"""Semantic-edge proofs for the TiKV two-phase-commit capture and the
MongoDB copy.existing initial load (queries/tier_a_ext2.py).

The oracle-parity test already hash-checks both keys end to end; these
tests pin the EDGES the hash alone would not explain to a reader:
rollback removal, pending-prewrite suppression, the resolved-ts frontier
cut, commit-order-vs-statement-order non-vacuity, and the copy/tail
boundary accounting.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_cdc_connectors_spark.queries.tier_a_ext import _LOGGED_SQL
from flink_cdc_connectors_spark.queries.tier_a_ext2 import (
    cdc_mongo_copy_existing,
    cdc_tikv_two_phase,
)

_TXN_SQL = f"""
WITH logged AS ({_LOGGED_SQL})
SELECT event_id, user_id, cents, op,
       event_id * 10 + 5 + (event_id * 37) % 5000 AS commit_ts,
       event_id % 11 = 3 AS rb,
       (event_id % 11 <> 3 AND event_id % 5 <> 0 AND event_id % 13 = 7) AS pending
FROM logged
"""


@pytest.fixture(scope="module")
def tikv_out(spark, sf_dir):
    return cdc_tikv_two_phase(spark, sf_dir).toPandas()


@pytest.fixture(scope="module")
def txn(duck):
    return duck.execute(_TXN_SQL).fetchdf().set_index("event_id")


def test_tikv_rollbacks_and_pending_never_visible(tikv_out, txn):
    """`handleRow` ROLLBACK removes the prewrite; a PREWRITE whose COMMIT
    never arrives stays buffered forever — neither may surface as the
    latest visible version of any key."""
    for eid in tikv_out["last_eid"]:
        row = txn.loc[int(eid)]
        assert not row["rb"], f"rolled-back event {eid} emitted"
        assert not row["pending"], f"uncommitted prewrite {eid} emitted"


def test_tikv_frontier_cuts_the_newest_commits(tikv_out, txn, duck):
    """flushRows emits only commit_ts <= resolvedTs: every emitted version
    sits at or below the frontier, and at least one committed row sits
    beyond it (the buffered tail — trivially the max commit itself)."""
    committed = txn[~txn["rb"] & ~txn["pending"]]
    frontier = int(committed["commit_ts"].max()) - 2000
    assert (tikv_out["last_commit_ts"] <= frontier).all()
    n_beyond = int((committed["commit_ts"] > frontier).sum())
    assert n_beyond > 0, "no committed row beyond the frontier: cut is vacuous"
    # visible-version accounting: the output keys' n_versions sum to the
    # visible rows of those keys, which is strictly less than all committed
    # rows (the buffered tail is missing)
    assert int(tikv_out["n_versions"].sum()) <= len(committed) - n_beyond


def test_tikv_commit_order_differs_from_statement_order(duck):
    """Non-vacuity of the 2PC semantics: among VISIBLE versions, at least
    one key's latest-by-commit_ts is a different event than its
    latest-by-event_id — a fold on statement order cannot match the
    oracle. (The jittered commit delay spans 5000 ticks while starts
    advance 10/event, so nearby statements commit out of order.)"""
    n = duck.execute(
        f"""
        WITH txn AS ({_TXN_SQL}),
        committed AS (SELECT * FROM txn WHERE NOT rb AND NOT pending),
        visible AS (
          SELECT * FROM committed
          WHERE commit_ts <= (SELECT max(commit_ts) - 2000 FROM committed)),
        by_commit AS (
          SELECT user_id, event_id FROM (
            SELECT user_id, event_id,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY commit_ts DESC, event_id DESC) rn
            FROM visible) WHERE rn = 1),
        by_stmt AS (
          SELECT user_id, event_id FROM (
            SELECT user_id, event_id,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY event_id DESC) rn
            FROM visible) WHERE rn = 1)
        SELECT count(*) FROM by_commit c JOIN by_stmt s USING (user_id)
        WHERE c.event_id <> s.event_id
        """
    ).fetchone()[0]
    assert n > 0, "commit order == statement order everywhere: key is vacuous"


def test_copy_existing_converges_to_true_latest_state(spark, sf_dir, duck):
    """Token-before-copy loses nothing: the merged copy+tail state equals
    plain latest state over the whole log for every surviving key."""
    out = cdc_mongo_copy_existing(spark, sf_dir).toPandas()
    truth = duck.execute(
        f"""
        WITH logged AS ({_LOGGED_SQL})
        SELECT user_id, cents FROM (
          SELECT user_id, cents, op,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY event_id DESC) rn
          FROM logged) WHERE rn = 1 AND op <> 'delete'
        """
    ).fetchdf()
    got = dict(zip(out["user_id"], out["final_cents"]))
    want = dict(zip(truth["user_id"], truth["cents"]))
    assert got == want


def test_copy_existing_phase_accounting_is_nonvacuous(spark, sf_dir):
    """Both phases must actually decide keys, and the overlap must exist:
    some key is quiescent since the copy snapshot (final_from='copy'),
    some key has tail events after it (final_from='stream'), and some key
    receives overlap double-delivery (n_overlap > 0)."""
    out = cdc_mongo_copy_existing(spark, sf_dir).toPandas()
    froms = set(out["final_from"])
    assert froms == {"copy", "stream"}, f"one-sided phases: {froms}"
    assert (out["n_overlap"] > 0).any(), "no overlap events: token==snapshot?"
    assert (out["n_tail"] > 0).any()
    # a 'copy'-decided key by definition has no tail events after C
    copy_keys = out[out["final_from"] == "copy"]
    assert (copy_keys["n_tail"] == 0).all()


def test_tikv_orphan_commit_is_dropped_not_crashed(spark):
    """A COMMIT whose (key, start_ts) has no buffered PREWRITE (lost under
    region-split backpressure — the reference's own code comment at
    TiKVRichParallelSourceFunction.java:263 'if pull cdc event block when
    region split, cdc event will lose', after which `prewrites.remove`
    returns null and the null row is offered downstream, i.e. the
    reference NPEs or emits a null row). Our decode DEFINES the behavior:
    the inner match drops the orphan commit — no crash, no phantom row —
    and the matched row for a healthy pair still surfaces."""
    pre = spark.createDataFrame([(1, 10, "a")], "k long, s long, v string")
    com = spark.createDataFrame(
        [(1, 10, 100), (2, 20, 200)], "k long, s long, c long"
    )
    rb = spark.createDataFrame([], "k long, s long")
    surviving = pre.join(rb, ["k", "s"], "left_anti")
    matched = com.join(surviving, ["k", "s"]).collect()
    assert [(r.k, r.s, r.c, r.v) for r in matched] == [(1, 10, 100, "a")]


def test_new_capture_keys_plan_budget(spark, sf_dir):
    """Scale audit: the TiKV decode is (checkpointed parse) + two
    equi-joins on (key, start_ts) + one PK window; copy.existing is
    (checkpointed log) + two PK windows + one stats aggregate. Neither
    may plan a cartesian product, and the post-checkpoint shuffle count
    stays bounded (joins may be BHJ at test scale or shuffle joins at
    cluster scale — both fit the budget)."""
    from flink_cdc_connectors_spark.plans import explain_str, shuffle_count
    from flink_cdc_connectors_spark.queries.tier_a_ext2 import (
        cdc_mongo_copy_existing,
        cdc_tikv_two_phase,
    )

    for fn, budget in ((cdc_tikv_two_phase, 6), (cdc_mongo_copy_existing, 4)):
        df = fn(spark, sf_dir)
        plan = explain_str(df)
        assert "CartesianProduct" not in plan, f"{fn.__name__}: cartesian product"
        n = shuffle_count(df)
        assert n <= budget, f"{fn.__name__}: {n} shuffles > budget {budget}"


# ---------------------------------------------------------------------------
# pgoutput in-band RELATION schema decode
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pgo_out(spark, sf_dir):
    from flink_cdc_connectors_spark.queries.tier_a_ext2 import (
        cdc_pgoutput_relation,
    )

    return cdc_pgoutput_relation(spark, sf_dir).toPandas()


def test_pgoutput_asof_schema_epochs(pgo_out, duck):
    """Rows before the DDL decode with the narrow schema (k_val is not a
    column yet -> NULL); rows after it decode the widened, reordered one
    (k_val populated wherever the fixture has one)."""
    mid2 = duck.execute("SELECT max(event_id) // 2 * 2 FROM events").fetchone()[0]
    pre = pgo_out[pgo_out["lsn"] <= mid2]
    post = pgo_out[(pgo_out["lsn"] > mid2) & (pgo_out["op"] != "D")]
    assert len(pre) > 0 and len(post) > 0, "one epoch is empty: DDL cut vacuous"
    assert pre["k_val"].isna().all(), "k_val decoded before the DDL added it"
    assert post["k_val"].notna().any(), "no k_val decoded after the DDL"


def test_pgoutput_positional_decode_is_nonvacuous(pgo_out, duck):
    """Both epochs must contain a row whose tuple would mis-zip under the
    OTHER epoch's column order (user_id != value_cents at that position):
    a decoder pinned to the first or to the latest RELATION message
    cannot hash-match."""
    mid2 = duck.execute("SELECT max(event_id) // 2 * 2 FROM events").fetchone()[0]
    live = pgo_out[pgo_out["op"] != "D"]
    pre = live[live["lsn"] <= mid2]
    post = live[live["lsn"] > mid2]
    assert (pre["user_id"] != pre["after_cents"]).any()
    assert (post["user_id"] != post["after_cents"]).any()


def test_pgoutput_old_tuple_replica_identity(pgo_out):
    """REPLICA IDENTITY FULL old tuples: inserts carry no before image,
    updates and deletes always do (every logged update/delete has a live
    predecessor by the _logged state machine)."""
    assert pgo_out[pgo_out["op"] == "I"]["before_cents"].isna().all()
    ud = pgo_out[pgo_out["op"] != "I"]
    assert ud["before_cents"].notna().all()
    assert pgo_out[pgo_out["op"] == "D"]["after_cents"].isna().all()


def test_pgoutput_plan_budget(spark, sf_dir):
    """Scale audit: one PK window (generation) + one broadcast join against
    the relation registry + one hash aggregate on the data LSN. No
    cartesian; the relation side must actually broadcast."""
    from flink_cdc_connectors_spark.plans import explain_str, shuffle_count
    from flink_cdc_connectors_spark.queries.tier_a_ext2 import (
        cdc_pgoutput_relation,
    )

    df = cdc_pgoutput_relation(spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    n = shuffle_count(df)
    assert n <= 4, f"{n} shuffles > budget 4"
