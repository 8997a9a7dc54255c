"""Changelog data model: the Debezium-style envelope and the op convention.

The reference consumes Kafka-Connect ``SourceRecord``s carrying the Debezium
envelope ``{before, after, source, op, ts_ms}`` and turns them into rows
tagged with a RowKind (reference:
flink-connector-debezium/src/main/java/com/ververica/cdc/debezium/table/
RowDataDebeziumDeserializeSchema.java:118-146, and the JSON wire format in
JsonDebeziumDeserializationSchema.java). Spark-side, the changelog is just a
DataFrame with an explicit ``op`` column plus ``before``/``after`` structs;
everything downstream (normalize, merge, aggregate) is ordinary DataFrame
code.

Fixture convention (documented in SURVEY.md / FIXTURES.md): the ``events``
table simulates a single-table binlog. ``(ts, event_id)`` is the total
offset order (the BinlogOffset.compareTo analog, reference:
flink-connector-mysql-cdc/.../source/offset/BinlogOffset.java:173-255);
``user_id`` is the primary key of the captured table. The generator emits
app-style ``event_type`` values, so the engine pins a deterministic op
mapping:

    signup -> insert ('c')    error -> delete ('d')    anything else -> update ('u')

A key's *current state* is its latest non-delete event in offset order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Maps the fixture's event_type to a changelog op. Kept as a plain dict so
# both the Column expression and oracle SQL are generated from one place.
EVENT_TYPE_TO_OP = {"signup": "insert", "error": "delete"}
DEFAULT_OP = "update"

# Debezium op codes (reference RowDataDebeziumDeserializeSchema.java:118-146):
# c/r -> INSERT(+I), u -> UPDATE (-U/+U pair in 'all' mode), d -> DELETE(-D).
OP_TO_DEBEZIUM = {"insert": "c", "update": "u", "delete": "d"}

# The single-table payload carried in before/after for the events fixture.
EVENT_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

# Debezium JSON envelope, as emitted by JsonDebeziumDeserializationSchema
# (reference flink-connector-debezium/.../JsonDebeziumDeserializationSchema.java).
DEBEZIUM_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("before", EVENT_PAYLOAD_SCHEMA),
        T.StructField("after", EVENT_PAYLOAD_SCHEMA),
        T.StructField(
            "source",
            T.StructType(
                [
                    T.StructField("db", T.StringType()),
                    T.StructField("table", T.StringType()),
                    T.StructField("ts_ms", T.LongType()),
                    T.StructField("file", T.StringType()),
                    T.StructField("pos", T.LongType()),
                ]
            ),
        ),
        T.StructField("op", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)


def op_col(event_type: Column | str = "event_type") -> Column:
    """event_type -> op ('insert'/'update'/'delete') as a Column expression."""
    c = F.col(event_type) if isinstance(event_type, str) else event_type
    expr = F.lit(DEFAULT_OP)
    for etype, op in EVENT_TYPE_TO_OP.items():
        expr = F.when(c == etype, F.lit(op)).otherwise(expr)
    return expr


def op_sql(event_type: str = "event_type") -> str:
    """Same mapping as :func:`op_col`, as ANSI SQL (for DuckDB oracles)."""
    whens = " ".join(
        f"WHEN {event_type} = '{etype}' THEN '{op}'"
        for etype, op in EVENT_TYPE_TO_OP.items()
    )
    return f"CASE {whens} ELSE '{DEFAULT_OP}' END"


def changelog_view(events: DataFrame) -> DataFrame:
    """The events fixture as a changelog: op column + offset columns.

    Output: (op, user_id, value, props, ts, event_id) where (ts, event_id)
    is the total offset order.
    """
    return events.select(
        op_col().alias("op"),
        "user_id",
        "value",
        "props",
        "ts",
        "event_id",
    )


def events_to_debezium_json(events: DataFrame, db: str = "app", table: str = "events") -> DataFrame:
    """Wrap fixture events into Debezium-envelope JSON strings.

    Mirrors the wire format the reference's JsonDebeziumDeserializationSchema
    produces: insert -> after only, delete -> before only, update -> both.
    Used to exercise the deserializer path end-to-end without a database.
    """
    payload = F.struct(
        F.col("user_id"), F.col("value"), F.col("props")
    )
    op = op_col()
    dbz_op = (
        F.when(op == "insert", F.lit("c"))
        .when(op == "delete", F.lit("d"))
        .otherwise(F.lit("u"))
    )
    envelope = F.struct(
        F.when(op != "insert", payload).alias("before"),
        F.when(op != "delete", payload).alias("after"),
        F.struct(
            F.lit(db).alias("db"),
            F.lit(table).alias("table"),
            (F.unix_millis(F.col("ts"))).alias("ts_ms"),
            F.lit("binlog.000001").alias("file"),
            F.col("event_id").alias("pos"),
        ).alias("source"),
        dbz_op.alias("op"),
        F.unix_millis(F.col("ts")).alias("ts_ms"),
    )
    return events.select(F.to_json(envelope).alias("value"))


def route_tables(envelope_rows: DataFrame) -> dict[tuple[str, str], DataFrame]:
    """Split a mixed multi-table changelog into per-table DataFrames.

    The reference captures many tables through one source (database/table
    regex lists, TableDiscoveryUtils; one binlog carries them all) and
    routes rows by the envelope's ``source.db``/``source.table``. Input:
    parsed rows with ``database_name``/``table_name`` columns. Output keyed
    by (db, table). The driver-side distinct is over table names only —
    tiny — and each per-table DataFrame is a filter the scan pushes down.
    """
    tables = [
        (r["database_name"], r["table_name"])
        for r in envelope_rows.select("database_name", "table_name").distinct().collect()
    ]
    return {
        (db, tb): envelope_rows.filter(
            (F.col("database_name") == db) & (F.col("table_name") == tb)
        )
        for db, tb in sorted(tables)
    }


def parse_debezium_json(
    raw: DataFrame, value_col: str = "value", mode: str = "upsert"
) -> DataFrame:
    """Debezium JSON -> typed changelog rows (the deserializer).

    ``mode='upsert'`` (DebeziumChangelogMode.upsert — one row per event):
    READ/CREATE -> +I from ``after``; DELETE -> -D from ``before``;
    UPDATE -> +U from ``after``. ``mode='all'`` (retract — what MySQL
    always emits, MySqlTableSource.java:149): UPDATE additionally emits the
    -U row from ``before``, with a ``row_kind`` column ('+I','-U','+U',
    '-D'). Reference: RowDataDebeziumDeserializeSchema.java:118-158;
    DebeziumChangelogMode.java.
    """
    if mode not in ("upsert", "all"):
        raise ValueError(f"mode must be 'upsert' or 'all', got {mode!r}")
    parsed = raw.select(
        F.from_json(F.col(value_col), DEBEZIUM_ENVELOPE_SCHEMA).alias("e")
    )
    op = (
        F.when(F.col("e.op").isin("c", "r"), F.lit("insert"))
        .when(F.col("e.op") == "d", F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    if mode == "upsert":
        row = F.when(F.col("e.op") == "d", F.col("e.before")).otherwise(F.col("e.after"))
        kind_rows = F.array(
            F.struct(
                F.when(F.col("e.op").isin("c", "r"), "+I")
                .when(F.col("e.op") == "d", "-D")
                .otherwise("+U")
                .alias("row_kind"),
                row.alias("payload"),
            )
        )
    else:
        kind_rows = (
            F.when(
                F.col("e.op").isin("c", "r"),
                F.array(F.struct(F.lit("+I").alias("row_kind"), F.col("e.after").alias("payload"))),
            )
            .when(
                F.col("e.op") == "d",
                F.array(F.struct(F.lit("-D").alias("row_kind"), F.col("e.before").alias("payload"))),
            )
            .otherwise(
                F.array(
                    F.struct(F.lit("-U").alias("row_kind"), F.col("e.before").alias("payload")),
                    F.struct(F.lit("+U").alias("row_kind"), F.col("e.after").alias("payload")),
                )
            )
        )
    exploded = parsed.withColumn("__k", F.explode(kind_rows))
    out = exploded.select(
        op.alias("op"),
        F.col("__k.payload.user_id").alias("user_id"),
        F.col("__k.payload.value").alias("value"),
        F.col("__k.payload.props").alias("props"),
        F.timestamp_millis(F.col("e.ts_ms")).alias("ts"),
        F.col("e.source.pos").alias("event_id"),
        F.col("e.source.db").alias("database_name"),
        F.col("e.source.table").alias("table_name"),
        F.timestamp_millis(F.col("e.source.ts_ms")).alias("op_ts"),
        F.col("__k.row_kind").alias("row_kind"),
    )
    return out.drop("row_kind") if mode == "upsert" else out
