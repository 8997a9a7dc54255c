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
