"""Unit tests on the CDC-semantics algorithms (the reference's test shape:
replay synthetic insert/update/delete sequences, assert materialized state).

Mirrors MySqlConnectorITCase.java:215-275 (flagship GROUP BY over a live
changelog) and RecordUtilsTest / MySqlChunkSplitterTest unit coverage.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from flink_cdc_connectors_spark.operators.cdc import (
    changelog_normalize,
    chunk_reconcile,
    even_chunks,
    uneven_chunks,
)

def _ts(minute: int) -> datetime:
    return datetime(2024, 1, 1, 0, minute, 0)


ROWS = [
    # (op, user_id, value, props, ts, event_id)
    ("insert", 1, 10.0, "{}", _ts(0), 1),
    ("insert", 2, 20.0, "{}", _ts(1), 2),
    ("update", 1, 11.0, "{}", _ts(2), 3),
    ("insert", 3, 30.0, "{}", _ts(3), 4),
    ("delete", 2, 20.0, "{}", _ts(4), 5),
    ("update", 3, 33.0, "{}", _ts(5), 6),
    ("update", 1, 12.0, "{}", _ts(6), 7),
]
SCHEMA = "op string, user_id long, value double, props string, ts timestamp, event_id long"


@pytest.fixture(scope="module")
def changelog(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_changelog_normalize_latest_state(changelog):
    got = {
        r["user_id"]: r["value"]
        for r in changelog_normalize(changelog).collect()
    }
    # user 2 deleted; users 1 and 3 at their last update
    assert got == {1: 12.0, 3: 33.0}


def test_changelog_normalize_keeps_deletes_when_asked(changelog):
    got = changelog_normalize(changelog, drop_deletes=False)
    by_key = {r["user_id"]: r["op"] for r in got.collect()}
    assert by_key == {1: "update", 2: "delete", 3: "update"}


def test_chunk_reconcile_equals_full_normalize(changelog, spark):
    """The DBLog invariant: reconcile(normalize(prefix), suffix) ==
    normalize(whole log) — for every split point."""
    full = {
        (r["user_id"], r["value"])
        for r in changelog_normalize(changelog).collect()
    }
    for split in [0, 2, 4, 6, 7]:
        snapshot = changelog_normalize(
            changelog.filter(F.col("event_id") <= split)
        ).select("user_id", "value", "props", "ts", "event_id")
        changes = changelog.filter(F.col("event_id") > split)
        merged = chunk_reconcile(snapshot, changes)
        got = {(r["user_id"], r["value"]) for r in merged.collect()}
        assert got == full, f"split={split}"


def test_chunk_reconcile_eviction_set_is_every_changed_key(spark):
    """Round-13 internals pin: the anti-join's eviction set is the
    DISTINCT keys of the change window (one pass), which must evict BOTH
    kinds of changed key — replaced (last op survives) and removed (last
    op is a delete, including a delete-only history) — while leaving
    untouched snapshot keys exactly as they were."""
    snapshot = spark.createDataFrame(
        [
            (1, 10.0, "{}", _ts(0), 1),   # will be replaced
            (2, 20.0, "{}", _ts(1), 2),   # delete-only change window
            (4, 40.0, "{}", _ts(2), 3),   # untouched
        ],
        "user_id long, value double, props string, ts timestamp, event_id long",
    )
    changes = spark.createDataFrame(
        [
            ("update", 1, 11.0, "{}", _ts(3), 4),
            ("delete", 2, 20.0, "{}", _ts(4), 5),
            ("insert", 5, 50.0, "{}", _ts(5), 6),  # new key via changes
            ("delete", 5, 50.0, "{}", _ts(6), 7),  # ... then deleted again
        ],
        SCHEMA,
    )
    got = {
        r["user_id"]: (r["value"], r["event_id"])
        for r in chunk_reconcile(snapshot, changes).collect()
    }
    assert got == {1: (11.0, 4), 4: (40.0, 3)}


def test_even_chunks_covers_all_rows(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    out = even_chunks(df, "k", chunk_size=100)
    assert out.count() == 1000
    n_chunks = out.select("chunk_id").distinct().count()
    assert n_chunks == 10
    # chunk ids contiguous from 0
    ids = sorted(r["chunk_id"] for r in out.select("chunk_id").distinct().collect())
    assert ids == list(range(10))


def test_even_chunks_rejects_skew(spark):
    # sparse keys: factor = (max-min+1)/count >> 1000
    df = spark.createDataFrame([(i * 10_000_000,) for i in range(10)], "k long")
    with pytest.raises(ValueError):
        even_chunks(df, "k", chunk_size=2)


def test_uneven_chunks_equal_counts(spark):
    # heavily skewed keys still land in equal-count chunks
    rows = [(1,)] * 50 + [(2,)] * 5 + [(1000,)] * 45
    df = spark.createDataFrame(rows, "k long")
    out = uneven_chunks(df, "k", num_chunks=4)
    counts = [r["n"] for r in out.groupBy("chunk_id").agg(F.count("*").alias("n")).collect()]
    assert sorted(counts) == [25, 25, 25, 25]


def test_retract_stream_kinds_and_cancellation(spark):
    """Hand-built log: insert(5), update(7), delete, update-after-delete(3)
    -> +I(5), -U(5)+U(7), -D(7), +I(3). Retraction sum = 3."""
    from flink_cdc_connectors_spark.operators.cdc import (
        retract_aggregate,
        to_retract_stream,
    )

    rows = [
        ("insert", 1, 5.0, "2024-01-01 00:00:00", 1),
        ("update", 1, 7.0, "2024-01-01 00:01:00", 2),
        ("delete", 1, 7.0, "2024-01-01 00:02:00", 3),
        ("update", 1, 3.0, "2024-01-01 00:03:00", 4),  # re-insert after delete
        ("delete", 2, 9.0, "2024-01-01 00:00:30", 5),  # delete of unseen key
    ]
    cl = spark.createDataFrame(
        rows, "op string, user_id long, value double, ts string, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rs = to_retract_stream(cl)
    kinds = [
        (r["row_kind"], r["user_id"], r["value"])
        for r in rs.orderBy("event_id", "row_kind").collect()
    ]
    assert kinds == [
        ("+I", 1, 5.0),
        ("+U", 1, 7.0),
        ("-U", 1, 5.0),
        ("-D", 1, 7.0),
        ("+I", 1, 3.0),
    ]
    agg = retract_aggregate(rs, [F.col("user_id")]).collect()
    assert len(agg) == 1
    assert float(agg[0]["sum_value"]) == 3.0 and agg[0]["n_live"] == 1


def test_parse_debezium_retract_mode(spark, sf_dir):
    """mode='all' emits -U/+U pairs; upsert mode one row per VALID event
    (the state-aware generator drops deletes of non-live keys)."""
    from pyspark.sql import Window

    from flink_cdc_connectors_spark.sources.envelope import (
        events_to_debezium_json,
        op_col,
        parse_debezium_json,
    )
    from flink_cdc_connectors_spark.sources.loaders import load_table

    events = load_table(spark, sf_dir, "events")
    raw = events_to_debezium_json(events)
    upsert = parse_debezium_json(raw)
    retract = parse_debezium_json(raw, mode="all")
    # Expected counts from the generator's state machine.
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    staged = events.withColumn("__op", op_col()).withColumn(
        "__prev_op", F.lag(op_col()).over(w)
    )
    live = F.col("__prev_op").isNotNull() & (F.col("__prev_op") != "delete")
    n_valid = staged.filter((F.col("__op") != "delete") | live).count()
    n_updates = upsert.filter("op = 'update'").count()
    assert upsert.count() == n_valid < events.count()
    assert retract.count() == n_valid + n_updates  # each update doubled
    assert set(r["row_kind"] for r in retract.select("row_kind").distinct().collect()) == {
        "+I", "-U", "+U", "-D",
    }
    assert "row_kind" not in upsert.columns
    # True before-images: every -U/-D payload equals the key's PREVIOUS
    # event payload, so retraction arithmetic telescopes to the final state
    # (asserted end-to-end by the cdc_envelope_retract_agg oracle).
    minus = retract.filter(F.col("row_kind").isin("-U", "-D"))
    assert minus.filter(F.col("user_id").isNull()).count() == 0


def test_sql_facade_views(spark, sf_dir):
    """The SQL-first UX: register views once, then plain spark.sql over
    the changelog, latest state, and retract stream — and the three views
    agree with each other (sum over latest state == retraction sum)."""
    from flink_cdc_connectors_spark.sql import register_cdc_views

    register_cdc_views(spark, sf_dir)
    n_log = spark.sql("SELECT count(*) n FROM events_changelog").first()["n"]
    assert n_log > 0
    state_sum = spark.sql(
        "SELECT round(sum(CAST(value AS DECIMAL(18,2))), 2) s FROM events_latest_state"
    ).first()["s"]
    retract_sum = spark.sql(
        """SELECT round(sum(CASE WHEN row_kind IN ('+I','+U')
                               THEN CAST(value AS DECIMAL(18,2))
                               ELSE -CAST(value AS DECIMAL(18,2)) END), 2) s
           FROM events_retract"""
    ).first()["s"]
    assert state_sum == retract_sum
    # an ordinary analytical SQL over the CDC views plans and runs
    top = spark.sql(
        """SELECT user_id, value FROM events_latest_state
           ORDER BY value DESC LIMIT 3"""
    ).collect()
    assert len(top) == 3


def test_heartbeats_advance_idle_table_offset(spark, sf_dir):
    """heartbeat.interval semantics (MySqlSourceOptions.java:187-192): an
    idle captured table's committed offset keeps advancing via heartbeat
    records, which are never emitted as data rows."""
    from flink_cdc_connectors_spark.sources.envelope import (
        committed_offset,
        events_to_debezium_json,
        heartbeat_envelopes,
        parse_debezium_json,
    )
    from flink_cdc_connectors_spark.sources.loaders import load_table

    events = load_table(spark, sf_dir, "events")
    cut = events.agg(F.expr("percentile(event_id, 0.3)")).first()[0]
    # table B goes idle after `cut`; the full log keeps churning
    idle_b = events.filter(F.col("event_id") <= cut)
    data_b = events_to_debezium_json(idle_b, table="b")
    hb = heartbeat_envelopes(events, interval_ms=3_600_000, table="b")
    stream_b = data_b.unionByName(hb)

    last_data_pos = committed_offset(data_b)
    full_pos = committed_offset(stream_b)
    log_end = events.agg(F.max("event_id")).first()[0]
    assert last_data_pos <= cut
    assert full_pos == log_end  # heartbeats carried the offset to log end

    # heartbeats are dropped from the decoded data in both changelog modes
    for mode in ("upsert", "all"):
        parsed = parse_debezium_json(stream_b, mode=mode)
        assert parsed.count() == parse_debezium_json(data_b, mode=mode).count()
        assert parsed.filter(F.col("user_id").isNull()).count() == 0


def test_sample_bucket_chunks_near_equal_counts(spark, sf_dir):
    """SampleBucketSplitStrategy analog: sampled equal-count bounds give
    chunks balanced up to sampling error, covering all rows exactly once."""
    from flink_cdc_connectors_spark.operators.cdc import sample_bucket_chunks
    from flink_cdc_connectors_spark.sources.loaders import load_table

    o = load_table(spark, sf_dir, "orders")
    total = o.count()
    chunks = (
        sample_bucket_chunks(o, "o_orderkey", num_chunks=8)
        .groupBy("chunk_id")
        .count()
        .collect()
    )
    assert sum(r["count"] for r in chunks) == total  # lossless cover
    assert len(chunks) == 8
    ideal = total / 8
    for r in chunks:
        assert abs(r["count"] - ideal) / ideal < 0.35, r  # sampling tolerance


def test_region_chunks_assignment_and_merge(spark):
    """TiDB-style physical-region split: boundary assignment + small-region
    merge up to min_rows."""
    from flink_cdc_connectors_spark.operators.cdc import region_chunks

    df = spark.range(0, 100).withColumnRenamed("id", "k")
    # regions: [0,10) [10,20) [20,90) [90,inf)
    plain = region_chunks(df, "k", [10, 20, 90])
    got = {r["chunk_id"]: r["cnt"] for r in plain.groupBy("chunk_id").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert got == {0: 10, 1: 10, 2: 70, 3: 10}
    # merging: each chunk must reach >= 25 rows -> [0,90) and [90,inf) fold
    merged = region_chunks(df, "k", [10, 20, 90], min_rows=25)
    got2 = {r["chunk_id"]: r["cnt"] for r in merged.groupBy("chunk_id").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert got2 == {0: 90, 1: 10}


def test_global_running_sum_matches_single_partition_truth(spark):
    """Distributed bucketed prefix-sum == the naive global-window answer,
    inclusive and exclusive, and the plan never collapses to one task."""
    from flink_cdc_connectors_spark.operators.cdc import global_running_sum
    from flink_cdc_connectors_spark.plans import has_single_partition_window

    df = spark.range(0, 5_000).select(
        (F.col("id") * 7 % 5_000).alias("k"), (F.col("id") % 13).alias("v")
    )
    got = {
        r["k"]: r["__runsum"]
        for r in global_running_sum(df, "k", "v", target_buckets=16).collect()
    }
    rows = sorted((r["k"], r["v"]) for r in df.collect())
    acc = 0
    for k, v in rows:
        acc += v
        assert got[k] == acc, f"inclusive mismatch at k={k}"
    ex = {
        r["k"]: r["__runsum"]
        for r in global_running_sum(
            df, "k", "v", exclusive=True, target_buckets=16
        ).collect()
    }
    acc = 0
    for k, v in rows:
        assert ex[k] == acc, f"exclusive mismatch at k={k}"
        acc += v
    out = global_running_sum(df, "k", "v", target_buckets=16)
    # one-row global-agg SinglePartition exchanges are legitimate in the
    # lazy operator; the anti-pattern is a data-wide single-partition window
    assert not has_single_partition_window(out)


# -- chunk key-column resolution (ChunkUtils.getChunkKeyColumn) ------------


def test_chunk_key_column_default_is_first_pk():
    from flink_cdc_connectors_spark.operators.cdc import get_chunk_key_column

    assert get_chunk_key_column(["a", "b"]) == "a"


def test_chunk_key_column_chosen_composite_member():
    from flink_cdc_connectors_spark.operators.cdc import get_chunk_key_column

    assert get_chunk_key_column(["a", "b"], "b") == "b"


def test_chunk_key_column_rejects_non_pk():
    """The reference's ValidationException: chosen column must be a PK
    member (mysql ChunkUtils.java:61-75)."""
    from flink_cdc_connectors_spark.operators.cdc import get_chunk_key_column

    with pytest.raises(ValueError, match="doesn't exist in the primary key"):
        get_chunk_key_column(["a", "b"], "c", table_id="db.t")


def test_chunk_key_column_requires_pk():
    from flink_cdc_connectors_spark.operators.cdc import get_chunk_key_column

    with pytest.raises(ValueError, match="requires primary key"):
        get_chunk_key_column([])


def test_chunk_key_column_oracle_rowid_fallback():
    """No PK + ROWID dialect -> the physical-address pseudo-column
    (oracle ChunkUtils.java:56-58)."""
    from flink_cdc_connectors_spark.operators.cdc import get_chunk_key_column

    assert get_chunk_key_column([], rowid_fallback="ROWID") == "ROWID"


def test_ddl_chunk_key_column_threads_to_config():
    from flink_cdc_connectors_spark.sources.ddl import (
        parse_create_table,
        to_source_config,
    )

    ddl = """
    CREATE TABLE t (a BIGINT, b BIGINT, PRIMARY KEY (a, b) NOT ENFORCED)
    WITH ('connector' = 'mysql-cdc', 'hostname' = 'h', 'username' = 'u',
          'password' = 'p', 'database-name' = 'd', 'table-name' = 't',
          'scan.incremental.snapshot.chunk.key-column' = 'b')
    """
    cfg = to_source_config(parse_create_table(ddl))
    assert cfg.chunk_key_column == "b"


# -- MongoDB splitVector / sharded split strategies ------------------------


def test_split_vector_chunk_sizes_bounded(spark):
    """Every chunk's byte size stays within max_chunk_bytes + one doc
    (splitVector splits where cumulative size crosses the limit)."""
    from flink_cdc_connectors_spark.operators.cdc import split_vector_chunks

    df = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.lit(100) + (F.col("id") % 7) * 10).alias("bytes")
    )
    out = split_vector_chunks(df, "k", "bytes", max_chunk_bytes=4000)
    per = out.groupBy("chunk_id").agg(
        F.sum("bytes").alias("b"), F.min("k").alias("lo"), F.max("k").alias("hi")
    ).collect()
    assert sum(r["b"] for r in per) == df.agg(F.sum("bytes")).first()[0]
    max_doc = 160
    for r in per:
        assert r["b"] <= 4000 + max_doc
    # chunks tile the key space contiguously in key order
    ordered = sorted(per, key=lambda r: r["chunk_id"])
    assert [r["chunk_id"] for r in ordered] == list(range(len(ordered)))
    for a, b in zip(ordered, ordered[1:]):
        assert a["hi"] < b["lo"]


def test_split_vector_small_collection_single_chunk(spark):
    """Total size under the limit -> one chunk (the reference's empty
    splitKeys -> SingleSplitStrategy path)."""
    from flink_cdc_connectors_spark.operators.cdc import split_vector_chunks

    df = spark.range(0, 10).select(F.col("id").alias("k"), F.lit(10).alias("bytes"))
    out = split_vector_chunks(df, "k", "bytes", max_chunk_bytes=1_000_000)
    assert out.select("chunk_id").distinct().collect()[0]["chunk_id"] == 0
    assert out.count() == 10


def test_sharded_chunks_assignment_and_end_caps(spark):
    from flink_cdc_connectors_spark.operators.cdc import sharded_chunks

    df = spark.range(0, 100).withColumnRenamed("id", "k")
    out = sharded_chunks(df, "k", [(None, 10), (10, 50), (50, None)])
    got = {
        r["chunk_id"]: r["n"]
        for r in out.groupBy("chunk_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == {0: 10, 1: 40, 2: 50}


def test_sharded_chunks_validates_metadata(spark):
    from flink_cdc_connectors_spark.operators.cdc import sharded_chunks

    df = spark.range(0, 10).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="non-contiguous"):
        sharded_chunks(df, "k", [(None, 10), (20, None)])
    with pytest.raises(ValueError, match="MinKey/MaxKey"):
        sharded_chunks(df, "k", [(0, 10), (10, None)])
    with pytest.raises(ValueError, match="empty chunk metadata"):
        sharded_chunks(df, "k", [])


def test_mongo_dispatch_fallback_to_sample(spark):
    """No shard metadata + no splitVector privilege (no size column) ->
    sample splitter, the reference's double fallback
    (MongoDBChunkSplitter.java:38-45 + SplitVectorSplitStrategy.java:78-98).
    """
    from flink_cdc_connectors_spark.operators.cdc import mongo_generate_chunks

    df = spark.range(0, 400).withColumnRenamed("id", "k")
    out = mongo_generate_chunks(df, "k", num_chunks=4)
    assert out.count() == 400
    assert out.select("chunk_id").distinct().count() == 4


def test_mongo_dispatch_prefers_sharded_metadata(spark):
    from flink_cdc_connectors_spark.operators.cdc import mongo_generate_chunks

    df = spark.range(0, 100).withColumnRenamed("id", "k")
    out = mongo_generate_chunks(
        df, "k", chunk_ranges=[(None, 50), (50, None)],
        size_col=F.lit(1), max_chunk_bytes=10,
    )
    assert out.select("chunk_id").distinct().count() == 2


def test_even_chunks_configurable_factor_bounds(spark):
    """The even-split guard bounds are the chunk-key.even-distribution
    options, not constants (SourceOptions.java:99-113): widening the upper
    bound accepts a sparse key the defaults reject."""
    df = spark.createDataFrame([(i * 5000,) for i in range(10)], "k long")
    with pytest.raises(ValueError, match="uneven key distribution"):
        even_chunks(df, "k", chunk_size=2)
    out = even_chunks(df, "k", chunk_size=2, factor_upper=10_000.0)
    assert out.count() == 10


def test_ddl_distribution_factor_bounds_thread_to_config():
    from flink_cdc_connectors_spark.sources.ddl import (
        parse_create_table,
        to_source_config,
    )

    ddl = """
    CREATE TABLE t (a BIGINT, PRIMARY KEY (a) NOT ENFORCED)
    WITH ('connector' = 'mysql-cdc', 'hostname' = 'h', 'username' = 'u',
          'password' = 'p', 'database-name' = 'd', 'table-name' = 't',
          'chunk-key.even-distribution.factor.upper-bound' = '50.0',
          'chunk-key.even-distribution.factor.lower-bound' = '0.5')
    """
    cfg = to_source_config(parse_create_table(ddl))
    assert cfg.distribution_factor_upper == 50.0
    assert cfg.distribution_factor_lower == 0.5


def test_meta_group_incremental_shipping():
    """Replay the reader<->coordinator split-meta protocol: starting from
    any interruption point, repeated next-group requests reconstruct the
    full chunk-meta list exactly once (the partial-last-group dedup of
    MySqlSourceReader.getExistedSplitsOfLastGroup)."""
    from flink_cdc_connectors_spark.operators.cdc import (
        next_meta_group,
        next_meta_group_id,
    )

    metas = [f"split-{i}" for i in range(23)]
    for start in (0, 1, 7, 8, 22, 23):  # incl. mid-group checkpoint points
        received = list(metas[:start])
        while len(received) < len(metas):
            got = next_meta_group(metas, len(received), meta_group_size=8)
            assert got, f"stalled at {len(received)}"
            received.extend(got)
        assert received == metas
    assert next_meta_group_id(0, 8) == 0
    assert next_meta_group_id(7, 8) == 0   # partial group -> re-request it
    assert next_meta_group_id(8, 8) == 1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        next_meta_group_id(1, 0)


def test_ddl_meta_group_size_threads_to_config():
    from flink_cdc_connectors_spark.sources.ddl import (
        parse_create_table,
        to_source_config,
    )

    ddl = """
    CREATE TABLE t (a BIGINT, PRIMARY KEY (a) NOT ENFORCED)
    WITH ('connector' = 'mysql-cdc', 'hostname' = 'h', 'username' = 'u',
          'password' = 'p', 'database-name' = 'd', 'table-name' = 't',
          'chunk-meta.group.size' = '64')
    """
    assert to_source_config(parse_create_table(ddl)).split_meta_group_size == 64


def test_sharded_chunks_rejects_none_interior_bound(spark):
    """Torn metadata with a missing interior bound fails as a validated
    rejection, not a downstream TypeError (None == None would otherwise
    pass the contiguity check)."""
    from flink_cdc_connectors_spark.operators.cdc import sharded_chunks

    df = spark.range(0, 10).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="torn chunk metadata"):
        sharded_chunks(df, "k", [(None, None), (None, 5), (5, None)])
    with pytest.raises(ValueError, match="torn chunk metadata"):
        sharded_chunks(df, "k", [(None, None), (None, None)])

def test_changelog_normalize_schema_epoch_breaks_offset_ties(spark):
    """A mid-stream re-snapshot image shares its (ts, event_id) with the
    raw change already emitted under the OLD decode; with a schema_epoch
    column present the normalize must pick the HIGHER epoch (the re-read
    precision) deterministically — in either input order."""
    rows = [
        # raw change, old-type decode (cents lost) — epoch 0
        ("update", 1, 12.0, "{}", _ts(6), 7, 0),
        # re-snapshot image of the same event, new-type decode — epoch 1
        ("insert", 1, 12.34, "{}", _ts(6), 7, 1),
        # an unrelated later change on another key
        ("update", 2, 99.5, "{}", _ts(7), 8, 1),
    ]
    schema = SCHEMA + ", schema_epoch int"
    for order in (rows, rows[::-1]):
        df = spark.createDataFrame(order, schema).repartition(4)
        got = {
            r["user_id"]: r["value"]
            for r in changelog_normalize(df).collect()
        }
        assert got == {1: 12.34, 2: 99.5}, (
            "stale old-epoch decode won the (ts, event_id) tie"
        )
