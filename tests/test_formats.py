"""Wire-format codec tests: changelog-json and Canal JSON round-trips."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_cdc_connectors_spark.sources.formats import (
    events_to_canal_json,
    events_to_changelog_json,
    events_to_maxwell_json,
    events_to_ogg_json,
    parse_canal_json,
    parse_changelog_json,
    parse_maxwell_json,
    parse_ogg_json,
)
from flink_cdc_connectors_spark.sources.loaders import load_table


def _kind_counts(df):
    return {
        r["row_kind"]: r["n"]
        for r in df.groupBy("row_kind").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def test_canal_envelope_shape(spark, sf_dir):
    """Canal envelopes carry the documented fields; UPDATE rows have a
    full before-image in old[0], INSERT/DELETE have no old."""
    e = load_table(spark, sf_dir, "events")
    raw = events_to_canal_json(e)
    probe = raw.select(
        F.get_json_object("value", "$.type").alias("t"),
        F.get_json_object("value", "$.database").alias("db"),
        F.get_json_object("value", "$.pkNames[0]").alias("pk"),
        F.get_json_object("value", "$.data[0].user_id").alias("d_uid"),
        F.get_json_object("value", "$.old[0].user_id").alias("o_uid"),
    )
    assert probe.filter(F.col("db") != "app").count() == 0
    assert probe.filter(F.col("pk") != "user_id").count() == 0
    assert probe.filter(F.col("d_uid").isNull()).count() == 0
    assert probe.filter((F.col("t") == "UPDATE") & F.col("o_uid").isNull()).count() == 0
    assert probe.filter((F.col("t") != "UPDATE") & F.col("o_uid").isNotNull()).count() == 0


def test_formats_decode_to_identical_retract_streams(spark, sf_dir):
    """Both codecs decode the same binlog to the same multiset of
    (row_kind, user_id, value) — UPDATE expands to the -U/+U pair, and
    per-kind counts obey the retract-stream invariants."""
    e = load_table(spark, sf_dir, "events")
    canal = parse_canal_json(events_to_canal_json(e))
    clog = parse_changelog_json(events_to_changelog_json(e))
    maxwell = parse_maxwell_json(events_to_maxwell_json(e))
    ogg = parse_ogg_json(events_to_ogg_json(e))
    cols = ["row_kind", "user_id", F.round("value", 2).alias("v")]
    for other in (clog, maxwell, ogg):
        assert canal.select(*cols).exceptAll(other.select(*cols)).count() == 0
        assert other.select(*cols).exceptAll(canal.select(*cols)).count() == 0
    kinds = _kind_counts(canal)
    assert set(kinds) == {"+I", "-U", "+U", "-D"}
    assert kinds["-U"] == kinds["+U"]
    # every key's stream starts with +I; deletes never exceed inserts
    assert kinds["-D"] <= kinds["+I"]


def test_maxwell_old_is_sparse(spark, sf_dir):
    """Maxwell updates carry only CHANGED columns in old — user_id never
    changes (it is the key), so it must never appear there; a changed
    value must."""
    e = load_table(spark, sf_dir, "events")
    raw = events_to_maxwell_json(e)
    upd = raw.select(
        F.get_json_object("value", "$.type").alias("t"),
        F.get_json_object("value", "$.old.user_id").alias("o_uid"),
        F.get_json_object("value", "$.old.value").alias("o_val"),
    ).filter(F.col("t") == "update")
    assert upd.count() > 0
    assert upd.filter(F.col("o_uid").isNotNull()).count() == 0
    assert upd.filter(F.col("o_val").isNotNull()).count() > 0


def test_ogg_envelope_shape(spark, sf_dir):
    """Ogg envelopes: op_type I/U/D; INSERT has after only, DELETE before
    only, UPDATE both; pos is zero-padded and lexically ordered like a
    GoldenGate trail position."""
    e = load_table(spark, sf_dir, "events")
    raw = events_to_ogg_json(e)
    probe = raw.select(
        F.get_json_object("value", "$.table").alias("tbl"),
        F.get_json_object("value", "$.op_type").alias("t"),
        F.get_json_object("value", "$.pos").alias("pos"),
        F.get_json_object("value", "$.before.user_id").alias("b_uid"),
        F.get_json_object("value", "$.after.user_id").alias("a_uid"),
    )
    assert probe.filter(F.col("tbl") != "APP.EVENTS").count() == 0
    assert probe.filter(~F.col("t").isin("I", "U", "D")).count() == 0
    assert probe.filter(F.length("pos") != 20).count() == 0
    assert probe.filter((F.col("t") == "I") & F.col("b_uid").isNotNull()).count() == 0
    assert probe.filter((F.col("t") == "I") & F.col("a_uid").isNull()).count() == 0
    assert probe.filter((F.col("t") == "D") & F.col("a_uid").isNotNull()).count() == 0
    assert probe.filter((F.col("t") == "D") & F.col("b_uid").isNull()).count() == 0
    assert (
        probe.filter(
            (F.col("t") == "U") & (F.col("b_uid").isNull() | F.col("a_uid").isNull())
        ).count()
        == 0
    )
