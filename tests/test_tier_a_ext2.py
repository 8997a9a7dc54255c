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


# ---------------------------------------------------------------------------
# decimal.handling.mode wire decode
# ---------------------------------------------------------------------------


def test_twos_complement_handles_minimal_and_padded_bytes(spark):
    """The decoder must accept ANY valid Connect Decimal byte length —
    BigInteger.toByteArray() minimal forms AND sign-extended padded words —
    sign-extending on the actual length (a fixed-64-bit decode reads the
    2-byte form of -195 as +65341)."""
    import base64

    from pyspark.sql import functions as F

    from flink_cdc_connectors_spark.queries.tier_a_ext2 import _twos_complement

    def b64(v: int, length: int | None = None) -> str:
        n = length or max(1, (v.bit_length() + 8) // 8)  # minimal w/ sign bit
        return base64.b64encode(v.to_bytes(n, "big", signed=True)).decode()

    cases = [
        (b64(195), 195),        # 2-byte minimal (0x00C3)
        (b64(-195), -195),      # 2-byte minimal (0xFF3D)
        (b64(3), 3),
        (b64(-3), -3),
        (b64(0), 0),
        (b64(195, 8), 195),     # 8-byte zero-padded
        (b64(-195, 8), -195),   # 8-byte sign-extended
        (b64((1 << 40) + 7), (1 << 40) + 7),
        (b64(-(1 << 40) - 7), -(1 << 40) - 7),
        (b64((1 << 62) + 11, 8), (1 << 62) + 11),
        (b64(-(1 << 62) - 11, 8), -(1 << 62) - 11),
    ]
    df = spark.createDataFrame(cases, "b string, want long")
    rows = df.select(
        _twos_complement(F.col("b")).cast("long").alias("got"), "want"
    ).collect()
    for r in rows:
        assert r.got == r.want, f"decoded {r.got}, want {r.want}"


@pytest.fixture(scope="module")
def dec_out(spark, sf_dir):
    from flink_cdc_connectors_spark.queries.tier_a_ext2 import (
        cdc_decimal_handling,
    )

    return cdc_decimal_handling(spark, sf_dir).toPandas()


def test_decimal_all_four_wire_modes_cover_the_fixture(dec_out, duck):
    """Every decimal.handling.mode path decodes rows, every event decodes
    exactly once, and the planted negation makes the two's-complement sign
    path non-vacuous (negative rows exist in modes 0 and 3)."""
    assert sorted(dec_out["mode"].unique()) == [0, 1, 2, 3]
    total = duck.execute("SELECT count(*) FROM events").fetchone()[0]
    assert int(dec_out["n"].sum()) == total
    neg = duck.execute(
        "SELECT count(*) FROM events WHERE event_id % 7 = 3 AND event_id % 4 IN (0, 3)"
    ).fetchone()[0]
    assert neg > 0, "no negative unscaled values reach the byte-wire modes"


def test_decimal_plan_is_jvm_only_one_shuffle(spark, sf_dir):
    """Scale audit: generate + decode are narrow per-row JVM expressions;
    the only exchange is the final hash aggregate. No Python UDF may appear
    (the whole point is a columnar scan-bound decode)."""
    from flink_cdc_connectors_spark.plans import explain_str, shuffle_count
    from flink_cdc_connectors_spark.queries.tier_a_ext2 import (
        cdc_decimal_handling,
    )

    df = cdc_decimal_handling(spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert shuffle_count(df) <= 1


# ---------------------------------------------------------------------------
# server-time-zone temporal decode
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tz_out(spark, sf_dir):
    from flink_cdc_connectors_spark.queries.tier_a_ext2 import (
        cdc_server_timezone,
    )

    return cdc_server_timezone(spark, sf_dir).toPandas()


def test_ltz_instant_is_invariant_across_server_zones(tz_out):
    """convertToLocalTimeZoneTimestamp recovers the same INSTANT no matter
    which server-time-zone decodes the ZonedTimestamp string."""
    per_event = tz_out.groupby("event_id")["ltz_utc_ms"].nunique()
    assert (per_event == 1).all()
    assert tz_out["tz"].nunique() == 3


def test_dt_wall_shift_matches_an_independent_tzdb(tz_out):
    """convertToTimestamp keeps the server wall clock: decoded wall minus
    the true instant must equal the zone's UTC offset AT that instant —
    checked against Python's zoneinfo, a THIRD tz implementation
    independent of both the JVM tzdb and DuckDB ICU."""
    from datetime import datetime, timezone
    from zoneinfo import ZoneInfo

    for r in tz_out.itertuples():
        inst = datetime.fromtimestamp(r.ltz_utc_ms / 1000, tz=timezone.utc)
        off_ms = ZoneInfo(r.tz).utcoffset(inst).total_seconds() * 1000
        assert r.dt_wall_ms - r.ltz_utc_ms == off_ms, (r.tz, r.event_id)
        assert r.ltz_wall_ms == r.dt_wall_ms
        # MicroTimestamp path agrees with the string path at second grain
        assert r.dt_us_wall_us // 1_000_000 == r.dt_wall_ms // 1000


def test_tz_zone_dependence_is_nonvacuous(tz_out):
    """The wall-clock decode must actually DIFFER between zones — a decode
    that ignores server-time-zone would pass an invariance-only test."""
    per_event = tz_out.groupby("event_id")["dt_wall_ms"].nunique()
    assert (per_event == 3).all()


def test_tz_plan_is_shuffle_free(spark, sf_dir):
    """Scale audit: a 3-row broadcast fan-out over a pruned scan with pure
    JVM temporal expressions — zero exchanges, no cartesian (the zone side
    must broadcast), no Python."""
    from flink_cdc_connectors_spark.plans import explain_str, shuffle_count
    from flink_cdc_connectors_spark.queries.tier_a_ext2 import (
        cdc_server_timezone,
    )

    df = cdc_server_timezone(spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert shuffle_count(df) == 0


def test_dsv2_added_tables_key_provenance_and_state(spark, sf_dir):
    """The checkpointed-restart key: both capture provenances present
    (some keys materialized from the first-run range, some from the
    backfilled range), and the end state equals the whole-log normalize."""
    from flink_cdc_connectors_spark.operators.cdc import changelog_normalize
    from flink_cdc_connectors_spark.queries.tier_a_ext2 import cdc_dsv2_added_tables
    from flink_cdc_connectors_spark.sources.envelope import changelog_view
    from flink_cdc_connectors_spark.sources.loaders import load_table

    out = cdc_dsv2_added_tables(spark, sf_dir).toPandas()
    assert set(out["range_tag"]) == {"initial", "added"}, (
        "both capture provenances must be non-empty"
    )
    want = (
        changelog_normalize(changelog_view(load_table(spark, sf_dir, "events")))
        .select("user_id", F.round("value", 2).alias("value_r"),
                F.col("event_id").alias("last_event_id"))
        .toPandas().sort_values("user_id").reset_index(drop=True)
    )
    got = out.sort_values("user_id").reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert (got["user_id"].values == want["user_id"].values).all()
    assert (got["last_event_id"].values == want["last_event_id"].values).all()
    assert (got["value_r"].values == want["value_r"].values).all()
