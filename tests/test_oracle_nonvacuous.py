"""Oracle non-vacuity at the DRIVER's scale factor.

The in-repo parity test runs at sf0.001; the driver compares at sf0.01.
A predicate that selects rows at the small fixture but ZERO at the
driver's can silently turn the driver row into a 0=0 vacuous pass
(round-3 catch: subquery_scalar's 2x-average threshold selected 2 rows
at sf0.001 and none at sf0.01). Running every ORACLE alone in DuckDB is
cheap and bounds the Spark side too — when the hash matches, both sides
have the oracle's row count."""

from __future__ import annotations

import duckdb
import pytest

from flink_cdc_connectors_spark import TABLES
from flink_cdc_connectors_spark.registry import all_queries

DRIVER_SF_DIR = "/root/testdata/sf0.01"

QUERIES = {k: s for k, s in all_queries().items() if s.oracle is not None}


@pytest.fixture(scope="module")
def duck01():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{DRIVER_SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_oracle_nonempty_at_driver_sf(key, duck01):
    n = duck01.execute(
        f"SELECT count(*) FROM ({QUERIES[key].oracle})"
    ).fetchone()[0]
    assert n > 0, f"{key}: oracle selects 0 rows at {DRIVER_SF_DIR} — vacuous driver pass"


def test_capture_formats_converge_on_identical_state(duck):
    """Every capture model describes the SAME database, so the formats
    that reconstruct full latest state must agree exactly: LogMiner
    redo-text parsing, SQL Server capture-table replay, and the MongoDB
    change-stream patch fold all yield the same live-user set, the same
    final values, and the same last offset per user (compared through
    their oracles — each side is already hash-checked against its Spark
    twin, so this closes the triangle). The ONE principled divergence is
    part of the assertion: MongoDB is a PARTIAL-image capture, so when a
    user's last event is a k-only patch (event_id % 3 == 1), its final
    value is the previous value-setting action's — full-image models carry
    the last row's value regardless. Every other user must match
    exactly."""
    from flink_cdc_connectors_spark.registry import all_queries

    qs = all_queries()
    lm = duck.execute(qs["cdc_logminer_redo"].oracle).fetchdf().set_index("user_id")
    ss = duck.execute(qs["cdc_capture_sqlserver"].oracle).fetchdf().set_index("user_id")
    mg = duck.execute(qs["cdc_mongo_changestream"].oracle).fetchdf().set_index("user_id")

    assert sorted(lm.index) == sorted(ss.index) == sorted(mg.index)
    diverged = 0
    for uid in lm.index:
        assert lm.loc[uid, "last_scn"] == ss.loc[uid, "last_lsn"] == mg.loc[uid, "last_eid"]
        assert lm.loc[uid, "value_cents"] == ss.loc[uid, "value_cents"]
        last_eid = int(lm.loc[uid, "last_scn"])
        # mongo op mapping: replace (eid%97==0) and insert carry the full
        # image; update with eid%3==1 patches k only and leaves value
        if last_eid % 3 == 1 and last_eid % 97 != 0:
            diverged += mg.loc[uid, "value_cents"] != lm.loc[uid, "value_cents"]
        else:
            assert lm.loc[uid, "value_cents"] == mg.loc[uid, "value_cents"], uid
    # the partial-image divergence must actually occur (non-vacuous)
    assert diverged > 0


def test_commit_order_visibility_diverges_from_statement_order(duck):
    """Commit-order visibility must MEAN something: against the
    statement-order latest state (LogMiner oracle), the OceanBase
    commit-framed replay must (a) reorder the winning event for at least
    one user touched by interleaved transactions, and (b) differ in the
    live-user set (an uncommitted tail can swallow a delete, keeping a
    user alive that statement order kills — or vice versa). Both effects
    are asserted non-vacuous."""
    from flink_cdc_connectors_spark.registry import all_queries

    qs = all_queries()
    stmt = duck.execute(qs["cdc_logminer_redo"].oracle).fetchdf().set_index("user_id")
    com = (
        duck.execute(qs["cdc_oceanbase_commit_order"].oracle)
        .fetchdf()
        .set_index("user_id")
    )
    common = sorted(set(stmt.index) & set(com.index))
    assert common
    reordered = sum(
        int(stmt.loc[u, "last_scn"]) != int(com.loc[u, "last_eid"]) for u in common
    )
    assert reordered > 0, "commit order never changed a winner — vacuous framing"
    assert set(stmt.index) != set(com.index), (
        "live sets identical — the uncommitted tail dropped nothing observable"
    )


def test_bag_set_ops_preserve_real_multiplicities(duck):
    """set_ops_bag must exercise BAG semantics, not degenerate to the
    distinct flavors: both EXCEPT ALL and INTERSECT ALL outputs must
    contain at least one row with multiplicity > 1 (at sf0.001 the maxima
    are 7 and 4)."""
    from flink_cdc_connectors_spark.registry import all_queries

    df = duck.execute(all_queries()["set_ops_bag"].oracle).fetchdf()
    mult = df.groupby(["op", "k", "p"]).size()
    assert mult.loc["except_all"].max() > 1
    assert mult.loc["intersect_all"].max() > 1


def test_update_lookup_anomalies_are_real(duck01):
    """cdc_mongo_update_lookup's semantics are only exercised if the fixture
    actually produces (a) lookahead images — an update whose looked-up
    fullDocument reflects a LATER same-batch write — and (b) dropped
    updates — deleted before the lookup (the deserializer's :145-149 null
    rule). Both zero would make the key a plain changelog-normalize clone.
    Convergence (lookup fold == exact fold at final state) is part of the
    value hash; this pins the en-route divergence at the driver's SF."""
    q = all_queries()["cdc_mongo_update_lookup"].oracle
    la, dr = duck01.execute(
        f"SELECT sum(n_lookahead), sum(n_dropped) FROM ({q})"
    ).fetchone()
    assert la and la > 0, "no lookahead images — lookup timing is vacuous"
    assert dr and dr > 0, "no dropped updates — the null-fullDocument rule is vacuous"


def test_curation_funnel_every_stage_cuts(duck01):
    """ext_curation_pipeline is only a funnel if every stage strictly
    drops documents at the driver's SF: lang-ID (the 'und' bucket),
    quality (n_quality < n_lang on a kept language), dedup
    (n_dedup < n_quality), decontamination (n_clean < n_dedup), and mix
    sampling (kept_docs < n_clean). A stage that drops nothing is
    untested by the hash."""
    q = all_queries()["ext_curation_pipeline"].oracle
    rows = duck01.execute(
        f"""SELECT sum(n_in - n_lang), sum(n_lang - n_quality),
                   sum(n_quality - n_dedup), sum(n_dedup - n_clean),
                   sum(n_clean - kept_docs) FROM ({q})"""
    ).fetchone()
    names = ["lang", "quality", "dedup", "decontaminate", "mix"]
    for name, cut in zip(names, rows):
        assert cut and cut > 0, f"curation stage '{name}' drops nothing — vacuous"


def test_changelog_mode_retraction_moves_groups(duck01):
    """cdc_changelog_mode_upsert's all-mode is only a real retract stream
    if updates MOVE rows between groups (the -U retraction then lands at a
    different group than the +U) — otherwise a naive insert-only fold
    would pass. Also pin that the validator path rejects something."""
    moved = duck01.execute(
        """WITH logged AS (SELECT event_id, user_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
                 lag(CAST(floor(value * 100 + 0.5) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_cents
               FROM events)
           SELECT count(*) FROM logged
           WHERE prev_cents IS NOT NULL
             AND abs(coalesce(cents, -1)) % 5 <> abs(coalesce(prev_cents, -1)) % 5"""
    ).fetchone()[0]
    assert moved > 0, "no update changes its group — retraction untested"
    q = all_queries()["cdc_changelog_mode_upsert"].oracle
    rej = duck01.execute(f"SELECT sum(n_reject) FROM ({q})").fetchone()[0]
    assert rej and rej > 0, "validator rejection path is vacuous"
