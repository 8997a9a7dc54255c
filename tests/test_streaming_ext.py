"""Streaming run of the stream-static enrichment join (`stream_join_static`).

The batch query registered in tier_b_ext is one micro-batch of this plan;
here the same join runs as a real Structured Streaming query — file-source
event stream joined to the static customer dim — and the final aggregate
must equal the batch answer over the same log (the MySqlConnectorITCase
materialize-and-compare pattern, applied to the tutorial's orders⋈products
enrichment shape, mysql-postgres-tutorial.md:263-267).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_cdc_connectors_spark.registry import all_queries
from flink_cdc_connectors_spark.sources.loaders import load_table

Q = all_queries()


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    """Fixture events as a multi-file parquet directory so the file source
    sees several micro-batches."""
    out = str(tmp_path_factory.mktemp("stream_ext") / "events_pq")
    load_table(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(out)
    return out


def test_stream_static_join_matches_batch(spark, sf_dir, events_stream_dir):
    static_events = spark.read.parquet(events_stream_dir)
    stream = (
        spark.readStream.schema(static_events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_stream_dir)
    )
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = (
        stream.join(F.broadcast(dim), stream.user_id == dim.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("stream_static_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = (
        spark.table("stream_static_sink")
        .toPandas()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    want = (
        Q["stream_join_static"]
        .builder(spark, sf_dir)
        .toPandas()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert (got["c_mktsegment"] == want["c_mktsegment"]).all()
    assert (got["n_events"] == want["n_events"]).all()
    assert (got["sum_value"] - want["sum_value"]).abs().max() < 1e-6


def test_streaming_patch_fold_matches_batch_mongo_key(spark, sf_dir, tmp_path):
    """The change-stream PATCH fold (partial images, stateful) must
    converge to the batch cdc_mongo_changestream result: documents folded
    from fullDocument/updatedFields/removedFields patches across TWO
    micro-batch phases (state persists over the phase boundary via the
    checkpoint). Removed fields must come back as real NULLs, and the
    offset guard must drop a deliberately redelivered phase-1 file."""
    import shutil

    from flink_cdc_connectors_spark.queries.tier_a_ext import _logged
    from flink_cdc_connectors_spark.streaming.stateful import streaming_patch_fold

    logged = _logged(spark, sf_dir)
    # mirror cdc_mongo_changestream's wire semantics as parsed change rows
    is_upd = F.col("op") == "update"
    mongo_op = (
        F.when(F.col("op") == "delete", "delete")
        .when(F.col("op") == "insert", "insert")
        .when(is_upd & (F.col("event_id") % 97 == 0), "replace")
        .otherwise("update")
    )
    changes = logged.select(
        "user_id",
        "ts",
        "event_id",
        "cents",
        "k_val",
        mongo_op.alias("op"),
    )
    mongo_op = F.col("op")
    is_upd = mongo_op == "update"
    changes = changes.withColumns(
        {
            # updates: eid%3=0 -> set value + REMOVE props_k; 1 -> set k
            # only; 2 -> set both. Full images act on every field.
            "value_cents": F.when(
                mongo_op.isin("insert", "replace")
                | ((mongo_op == "update") & (F.col("event_id") % 3 != 1)),
                F.col("cents"),
            ),
            "value_cents_act": F.when(
                mongo_op.isin("insert", "replace")
                | ((mongo_op == "update") & (F.col("event_id") % 3 != 1)),
                F.lit(1),
            ).otherwise(F.lit(0)),
            "props_k": F.when(
                mongo_op.isin("insert", "replace")
                | ((mongo_op == "update") & (F.col("event_id") % 3 != 0)),
                F.col("k_val"),
            ),
            "props_k_act": F.when(
                mongo_op.isin("insert", "replace") | (mongo_op == "update"), F.lit(1)
            ).otherwise(F.lit(0)),
        }
    ).drop("cents", "k_val")
    # phase split on ts (strict): every phase-2 offset > every phase-1 offset
    changes = changes.withColumn("__us", F.unix_micros("ts"))
    us_split = changes.selectExpr(
        "percentile_cont(0.6) WITHIN GROUP (ORDER BY __us) AS t"
    ).first()["t"]
    src = tmp_path / "changes"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    changes.filter(F.col("__us") <= us_split).drop("__us").coalesce(1).write.parquet(
        str(src / "phase1")
    )

    schema = changes.drop("__us").schema

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "*.parquet")
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        folded = streaming_patch_fold(stream)
        q = (
            folded.writeStream.outputMode("update")
            .foreachBatch(
                lambda bdf, eid: bdf.write.mode("append").parquet(str(out))
            )
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        terminated = q.awaitTermination(300)
        assert terminated, f"stream did not terminate: {q.exception()}"

    drain()
    # redeliver phase 1 verbatim (at-least-once): the offset guard must
    # make this a no-op for final state
    shutil.copytree(src / "phase1", src / "phase1_redelivered")
    changes.filter(F.col("__us") > us_split).drop("__us").coalesce(1).write.parquet(
        str(src / "phase2")
    )
    drain()

    emissions = spark.read.parquet(str(out)).toPandas()
    assert len(emissions) > 0
    last = (
        emissions.sort_values(["ts_ms", "event_id"]).groupby("user_id").tail(1)
    )
    live = last[last["op"] != "delete"].set_index("user_id")

    batch = (
        all_queries()["cdc_mongo_changestream"].builder(spark, sf_dir).toPandas()
    ).set_index("user_id")
    assert sorted(live.index) == sorted(batch.index)
    for uid in batch.index:
        assert live.loc[uid, "event_id"] == batch.loc[uid, "last_eid"], uid
        assert live.loc[uid, "value_cents"] == batch.loc[uid, "value_cents"], uid
        b_k, s_k = batch.loc[uid, "props_k"], live.loc[uid, "props_k"]
        import pandas as pd

        if pd.isna(b_k):
            assert pd.isna(s_k), uid  # removal survived as NULL
        else:
            assert s_k == b_k, uid
    # the scenario actually exercises removals
    assert batch["props_k"].isna().sum() > 0


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, events_stream_dir):
    """Flink's INTERVAL JOIN as a real watermarked stream-stream join:
    'signup' events join subsequent same-user events within 2 hours
    (a.ts in [s.ts, s.ts + 2h]); both sides are unbounded and watermarked,
    which is what lets Spark bound the join state. The drained result must
    equal the batch range join over the same log. NB: one availableNow
    drain (no maxFilesPerTrigger) — the fixture's files each span the full
    30-day range, so ANY multi-batch split would advance the watermark
    past earlier batches' rows and evict join state mid-drain; per-file
    time ordering, not this test, is what real deployments rely on."""
    static_events = spark.read.parquet(events_stream_dir)
    schema = static_events.schema

    def side():
        return (
            spark.readStream.schema(schema)
            .parquet(events_stream_dir)
            .withWatermark("ts", "1 hour")
        )

    from pyspark.sql import functions as F

    signups = (
        side()
        .filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id").alias("s_user"),
            F.col("event_id").alias("s_eid"),
            F.col("ts").alias("s_ts"),
        )
    )
    follows = side().select(
        "user_id", F.col("event_id").alias("f_eid"), F.col("ts").alias("f_ts"), "value"
    )
    joined = signups.join(
        follows,
        (F.col("s_user") == F.col("user_id"))
        & (F.col("f_ts") >= F.col("s_ts"))
        & (F.col("f_ts") <= F.col("s_ts") + F.expr("INTERVAL 2 HOURS"))
        & (F.col("f_eid") != F.col("s_eid")),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("interval_join_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), f"stream did not terminate: {q.exception()}"

    got = (
        spark.table("interval_join_sink")
        .groupBy("s_user")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .toPandas()
        .set_index("s_user")
        .sort_index()
    )
    b = static_events
    bs = b.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_user"), F.col("event_id").alias("s_eid"), F.col("ts").alias("s_ts")
    )
    bf = b.select("user_id", F.col("event_id").alias("f_eid"), F.col("ts").alias("f_ts"), "value")
    want = (
        bs.join(
            bf,
            (F.col("s_user") == F.col("user_id"))
            & (F.col("f_ts") >= F.col("s_ts"))
            & (F.col("f_ts") <= F.col("s_ts") + F.expr("INTERVAL 2 HOURS"))
            & (F.col("f_eid") != F.col("s_eid")),
        )
        .groupBy("s_user")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .toPandas()
        .set_index("s_user")
        .sort_index()
    )
    assert len(want) > 0
    assert list(got.index) == list(want.index)
    assert (got["n_pairs"] == want["n_pairs"]).all()
    assert (got["sum_value"] - want["sum_value"]).abs().max() < 1e-6


def test_e2e_windowed_sink_is_localized_and_dropped(spark, sf_dir, monkeypatch):
    """ADVICE r10: stream_e2e_windowed's memory-sink table (and the child
    session holding it) must not outlive the builder.  Pins: (a) the
    returned frame belongs to the CALLER's session (pre-fix it was a lazy
    read of the child session's memory table), (b) the child session's
    catalog holds no temp view after the builder returns, (c) two
    invocations agree — the sink drop cannot change the answer."""
    import pyspark.sql.session as S

    children = []
    orig = S.SparkSession.newSession

    def tracking_new_session(self):
        ns = orig(self)
        children.append(ns)
        return ns

    monkeypatch.setattr(S.SparkSession, "newSession", tracking_new_session)
    df1 = Q["stream_e2e_windowed"].builder(spark, sf_dir)
    assert df1.sparkSession is spark
    assert children, "builder no longer uses an isolated child session?"
    for ns in children:
        # only TEMPORARY entries are session-owned (the memory sink's view);
        # persistent warehouse tables from other tests ride the shared
        # catalog and appear in every session's listTables
        leaked = [t.name for t in ns.catalog.listTables() if t.isTemporary]
        assert leaked == [], f"memory-sink views left in child session: {leaked}"
    rows1 = sorted(map(tuple, df1.collect()))
    rows2 = sorted(map(tuple, Q["stream_e2e_windowed"].builder(spark, sf_dir).collect()))
    assert rows1 == rows2 and len(rows1) > 0
