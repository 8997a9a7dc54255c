"""Property-based invariants over randomized changelogs (hypothesis).

SURVEY §5: "changelog-semantics tests replay synthetic
insert/update/delete sequences ... and assert the materialized state
equals the final table". Here the logs are RANDOM (hypothesis-generated),
so the algebraic contracts hold for arbitrary DML interleavings, not just
the fixture:

  1. reconcile(normalize(prefix), suffix) == normalize(whole log)
     for EVERY split point (the DBLog correctness core)
  2. retraction arithmetic over the log == aggregate over final state
  3. normalize is idempotent
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_cdc_connectors_spark.operators.cdc import (
    changelog_normalize,
    chunk_reconcile,
    retract_aggregate,
    to_retract_stream,
)

# A random changelog: ~40 events over 8 keys, arbitrary op interleavings.
_events = st.lists(
    st.tuples(
        st.sampled_from(["insert", "update", "delete"]),
        st.integers(min_value=0, max_value=7),  # user_id
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=40,
)


def _to_df(spark, raw):
    t0 = datetime(2024, 1, 1)
    rows = [
        (op, uid, round(val, 2), "{}", t0 + timedelta(minutes=i), i)
        for i, (op, uid, val) in enumerate(raw)
    ]
    return spark.createDataFrame(
        rows, "op string, user_id long, value double, props string, ts timestamp, event_id long"
    )


def _state(df):
    return {
        r["user_id"]: (r["event_id"], round(r["value"], 2))
        for r in df.select("user_id", "event_id", "value").collect()
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(raw=_events, split_frac=st.floats(min_value=0.0, max_value=1.0))
def test_reconcile_equals_whole_log_normalize(spark, raw, split_frac):
    cl = _to_df(spark, raw)
    split = int(len(raw) * split_frac)
    snapshot = changelog_normalize(cl.filter(F.col("event_id") < split)).select(
        "user_id", "value", "props", "ts", "event_id"
    )
    changes = cl.filter(F.col("event_id") >= split)
    merged = chunk_reconcile(snapshot, changes)
    assert _state(merged) == _state(changelog_normalize(cl))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(raw=_events)
def test_retract_agg_equals_state_agg(spark, raw):
    cl = _to_df(spark, raw)
    via_retract = {
        r["user_id"]: (float(r["sum_value"]), r["n_live"])
        for r in retract_aggregate(to_retract_stream(cl), [F.col("user_id")]).collect()
    }
    state = changelog_normalize(cl)
    via_state = {
        r["user_id"]: (float(r["s"]), r["n"])
        for r in state.groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert via_retract == via_state


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(raw=_events)
def test_normalize_idempotent(spark, raw):
    cl = _to_df(spark, raw)
    once = changelog_normalize(cl)
    twice = changelog_normalize(once)
    assert _state(once) == _state(twice)
