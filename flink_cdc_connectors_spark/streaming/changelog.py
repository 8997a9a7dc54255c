"""Streaming changelog ingestion and materialization.

The reference delivers an exactly-once changelog stream into Flink; any SQL
over it stays continuously correct under inserts/updates/deletes
(flink-connector-mysql-cdc/.../table/MySqlTableSource.java:149 declares
ChangelogMode.all; the flagship ITCase MySqlConnectorITCase.java:215-275
materializes a GROUP BY over live DML). Spark has no retract-stream trait,
so the engine's contract is:

  stream of envelope rows  ->  foreachBatch  ->  MERGE into latest-state
  store  ->  aggregates over the store are retract-correct by construction
  (normalize-then-aggregate, SURVEY.md §4).

The streaming source is file-based Debezium-envelope JSON — the exact wire
shape of the reference's JsonDebeziumDeserializationSchema
(flink-connector-debezium/.../JsonDebeziumDeserializationSchema.java) — so
any real Debezium topic/file dump plugs in unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_cdc_connectors_spark.sources.envelope import (
    DEBEZIUM_ENVELOPE_SCHEMA,
    parse_debezium_json,
)


def read_changelog_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stream Debezium-envelope JSON files -> typed changelog rows.

    Output columns: (op, user_id, value, props, ts, event_id,
    database_name, table_name, op_ts) — §1.1's envelope flattened, same as
    the batch ``parse_debezium_json``.

    Scale: the file source lists incrementally and checkpoints consumed
    files; ``maxFilesPerTrigger`` bounds micro-batch size the way the
    reference bounds fetch batches (MySqlSourceOptions scan.fetch.size).
    """
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(path)
    return parse_debezium_json(raw, value_col="value")


def stream_changelog_from_events(
    spark: SparkSession, events_json_dir: str, **kwargs
) -> DataFrame:
    """Alias with the fixture-centric name used by tests."""
    return read_changelog_stream(spark, events_json_dir, **kwargs)


def _merge_latest_state(
    batch_df: DataFrame, state_dir: str, key_cols: list[str]
) -> None:
    """MERGE one micro-batch of changelog rows into the latest-state store.

    The upsert contract of the reference's sinks (insert/update replace by
    PK, delete removes — RecordUtils.upsertBinlog:77-114 applied
    continuously). Without a transactional table format in this container,
    the store is a parquet directory rewritten per epoch:

        new_state = normalize( current_state(as inserts)  UNION  batch )

    With Delta/Iceberg available this becomes ``MERGE INTO`` keyed on the
    PK — same semantics, row-level instead of rewrite. The rewrite is
    correct (idempotent per epoch, resumable from checkpoint) and the
    normalize is one hash shuffle on the key.

    Delete events are kept in the store as TOMBSTONES (op='delete') rather
    than removed: micro-batches need not respect offset order across keys
    (the file source may deliver a stale event after the delete that
    supersedes it), and with tombstones retained the merge is fully
    order-independent — the offset comparison decides the winner no matter
    the arrival order. ``read_latest_state`` filters them out. This is
    exactly Kafka log-compaction semantics; a production store compacts
    tombstones once the source offset passes them.
    """
    spark = batch_df.sparkSession
    batch_cols = batch_df.columns
    if os.path.isdir(state_dir) and any(
        f.endswith(".parquet") for f in os.listdir(state_dir)
    ):
        current = spark.read.parquet(state_dir)
    else:
        current = spark.createDataFrame([], batch_df.schema)
    merged = current.select(*batch_cols).unionByName(batch_df)
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    new_state = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    # Rewrite atomically enough for a local store: write tmp, swap.
    tmp = state_dir.rstrip("/") + ".tmp"
    new_state.write.mode("overwrite").parquet(tmp)
    import shutil

    if os.path.isdir(state_dir):
        shutil.rmtree(state_dir)
    os.replace(tmp, state_dir)


def materialize_latest_state(
    changelog_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    key_cols: list[str] = ("user_id",),
    available_now: bool = True,
):
    """Run the stream -> latest-state materialization (foreachBatch MERGE).

    Returns the StreamingQuery. With ``available_now`` the query drains all
    currently-visible input and stops — the batch-bounded mode tests use;
    a live deployment passes False and keeps running per trigger.
    """
    writer = (
        changelog_stream.writeStream.outputMode("append")
        .foreachBatch(
            lambda df, epoch: _merge_latest_state(df, state_dir, list(key_cols))
        )
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_latest_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Query view over the materialized store: live rows only (tombstones
    filtered) — the upsert-sink read contract."""
    return spark.read.parquet(state_dir).filter(F.col("op") != "delete")


def compact_tombstones(spark: SparkSession, state_dir: str, safe_offset: int) -> int:
    """Drop tombstones whose offset is <= ``safe_offset`` — Kafka
    log-compaction's delete-retention applied to the state store.

    A tombstone is only needed while an out-of-order event older than it
    could still arrive; once the source offset has durably passed
    ``safe_offset`` (the stream's committed position), tombstones at or
    below it can never be contradicted and are dead weight. Returns the
    number of tombstones removed."""
    state = spark.read.parquet(state_dir)
    dead = (F.col("op") == "delete") & (F.col("event_id") <= safe_offset)
    n = state.filter(dead).count()
    if n:
        tmp = state_dir.rstrip("/") + ".compact"
        state.filter(~dead).write.mode("overwrite").parquet(tmp)
        import shutil

        shutil.rmtree(state_dir)
        os.replace(tmp, state_dir)
    return n


def windowed_agg_stream(
    changelog_stream: DataFrame,
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time windowed aggregation with a watermark over the change
    stream (the canonical Flink-over-CDC use, README.md:21-25; event time =
    op_ts per MySqlReadableMetadata.java:68).

    Late events beyond the watermark are dropped by the state store —
    Spark's analog of the reference's low/high watermark windows
    (SignalEventDispatcher.java:78-112).
    """
    win = (
        F.window("ts", window_duration, slide)
        if slide
        else F.window("ts", window_duration)
    )
    return (
        changelog_stream.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "op")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "op", "n", "sum_value")
    )
