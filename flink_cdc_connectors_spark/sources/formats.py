"""Alternative CDC wire formats: changelog-json, Canal JSON, Maxwell JSON,
Ogg JSON.

The reference ships its own ``changelog-json`` format (the pre-Flink-CDC-2.2
wire form, `docs/content/formats/changelog-json.md`: one JSON object per
changelog row — ``{"data": {...}, "op": "+I"|"-U"|"+U"|"-D"}``) and its
documentation directs users to the Flink-standard CDC formats (Debezium /
Canal / Maxwell) for everything newer. ``envelope.py`` covers Debezium;
this module adds the other three shapes the ecosystem actually feeds a CDC
pipeline:

- **changelog-json**: row-kind-expanded, one envelope per changelog ROW
  (an UPDATE is already two wire records, -U then +U).
- **Canal JSON**: one envelope per binlog EVENT —
  ``{"data": [row...], "old": [before...], "type": "INSERT|UPDATE|DELETE",
  "database", "table", "es", "ts", "pkNames"}`` — the decoder expands
  UPDATE into the -U/+U pair exactly like Flink's canal-json format does.
  (Real Canal may emit only changed columns in ``old``; the generator
  emits the full before-image, which is the strictly richer form.)
- **Maxwell JSON**: one envelope per binlog EVENT with a SPARSE ``old``
  (only changed columns) — the decoder rebuilds the before-image by
  overlaying ``old`` on ``data`` per field.
- **Ogg JSON** (Oracle GoldenGate, Flink's ``ogg-json`` format): one
  envelope per EVENT — ``{"table": "DB.TABLE", "op_type": "I|U|D",
  "op_ts", "current_ts", "pos", "primary_keys": [...], "before", "after"}``
  — INSERT carries ``after`` only, DELETE ``before`` only, UPDATE both;
  the decoder expands U into the -U/+U pair.

All encoders are state-aware: they replay per-key state with one lag
window (the same staging as ``events_to_debezium_json``) so before-images
are true prior rows, and deletes of missing keys are dropped — what a
database binlog would actually contain. One hash shuffle on the primary
key; every decode is a single ``from_json`` projection (no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_cdc_connectors_spark.sources.envelope import (
    EVENT_PAYLOAD_SCHEMA,
    op_col,
)

ROW_KINDS = ("+I", "-U", "+U", "-D")


def _staged(events: DataFrame) -> DataFrame:
    """Per-key state replay: app op, current payload, previous payload and
    op (lag over the offset order), liveness of the previous image."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    payload = F.struct(F.col("user_id"), F.col("value"), F.col("props"))
    return (
        events.withColumn("__app_op", op_col())
        .withColumn("__payload", payload)
        .withColumn("__prev_payload", F.lag(payload).over(w))
        .withColumn("__prev_op", F.lag(op_col()).over(w))
        .withColumn(
            "__live",
            F.col("__prev_op").isNotNull() & (F.col("__prev_op") != "delete"),
        )
        .filter((F.col("__app_op") != "delete") | F.col("__live"))
    )


def events_to_changelog_json(events: DataFrame, staged: DataFrame | None = None) -> DataFrame:
    """Fixture events -> changelog-json wire records (one JSON per
    changelog ROW; UPDATE emits the -U/+U pair as two records).

    ``staged``: optionally pass a pre-computed (possibly materialized)
    ``_staged`` frame so multi-format callers run the per-key state
    replay ONCE instead of once per format."""
    s = _staged(events) if staged is None else staged
    rows = (
        F.when(
            F.col("__app_op") == "delete",
            F.array(
                F.struct(F.lit("-D").alias("op"), F.col("__prev_payload").alias("data"))
            ),
        )
        .when(
            F.col("__live"),
            F.array(
                F.struct(F.lit("-U").alias("op"), F.col("__prev_payload").alias("data")),
                F.struct(F.lit("+U").alias("op"), F.col("__payload").alias("data")),
            ),
        )
        .otherwise(
            F.array(
                F.struct(F.lit("+I").alias("op"), F.col("__payload").alias("data"))
            )
        )
    )
    ex = s.withColumn("__r", F.explode(rows))
    return ex.select(
        F.to_json(
            F.struct(F.col("__r.data").alias("data"), F.col("__r.op").alias("op"))
        ).alias("value")
    )


def parse_changelog_json(
    raw: DataFrame,
    value_col: str = "value",
    payload_schema: T.StructType = EVENT_PAYLOAD_SCHEMA,
) -> DataFrame:
    """changelog-json -> typed rows with ``row_kind`` — one ``from_json``
    projection, schema parameterized per table."""
    schema = T.StructType(
        [
            T.StructField("data", payload_schema, True),
            T.StructField("op", T.StringType(), True),
        ]
    )
    parsed = raw.select(F.from_json(F.col(value_col), schema).alias("e"))
    return parsed.select(
        *[F.col(f"e.data.{f.name}").alias(f.name) for f in payload_schema.fields],
        F.col("e.op").alias("row_kind"),
    )


def events_to_canal_json(
    events: DataFrame, db: str = "app", table: str = "events",
    staged: DataFrame | None = None,
) -> DataFrame:
    """Fixture events -> Canal JSON (one envelope per binlog EVENT;
    ``data``/``old`` are single-element arrays of the full row images).
    ``staged``: see events_to_changelog_json."""
    s = _staged(events) if staged is None else staged
    ctype = (
        F.when(F.col("__app_op") == "delete", F.lit("DELETE"))
        .when(F.col("__live"), F.lit("UPDATE"))
        .otherwise(F.lit("INSERT"))
    )
    data = F.when(
        F.col("__app_op") == "delete", F.array(F.col("__prev_payload"))
    ).otherwise(F.array(F.col("__payload")))
    old = F.when(
        (F.col("__app_op") != "delete") & F.col("__live"),
        F.array(F.col("__prev_payload")),
    )
    envelope = F.struct(
        data.alias("data"),
        old.alias("old"),
        ctype.alias("type"),
        F.lit(db).alias("database"),
        F.lit(table).alias("table"),
        F.unix_millis(F.col("ts")).alias("es"),
        F.unix_millis(F.col("ts")).alias("ts"),
        F.array(F.lit("user_id")).alias("pkNames"),
    )
    return s.select(F.to_json(envelope).alias("value"))


def parse_canal_json(
    raw: DataFrame,
    value_col: str = "value",
    payload_schema: T.StructType = EVENT_PAYLOAD_SCHEMA,
) -> DataFrame:
    """Canal JSON -> typed changelog rows with ``row_kind``: INSERT -> +I,
    DELETE -> -D, UPDATE -> the (-U from ``old``, +U from ``data``) pair —
    the same expansion Flink's canal-json format performs."""
    schema = T.StructType(
        [
            T.StructField("data", T.ArrayType(payload_schema), True),
            T.StructField("old", T.ArrayType(payload_schema), True),
            T.StructField("type", T.StringType(), True),
            T.StructField("database", T.StringType(), True),
            T.StructField("table", T.StringType(), True),
            T.StructField("es", T.LongType(), True),
            T.StructField("ts", T.LongType(), True),
            T.StructField("pkNames", T.ArrayType(T.StringType()), True),
        ]
    )
    parsed = raw.select(F.from_json(F.col(value_col), schema).alias("e"))
    first = lambda c: F.element_at(c, 1)  # noqa: E731
    rows = (
        F.when(
            F.col("e.type") == "DELETE",
            F.array(
                F.struct(
                    F.lit("-D").alias("row_kind"),
                    first(F.col("e.data")).alias("payload"),
                )
            ),
        )
        .when(
            F.col("e.type") == "UPDATE",
            F.array(
                F.struct(
                    F.lit("-U").alias("row_kind"),
                    first(F.col("e.old")).alias("payload"),
                ),
                F.struct(
                    F.lit("+U").alias("row_kind"),
                    first(F.col("e.data")).alias("payload"),
                ),
            ),
        )
        .otherwise(
            F.array(
                F.struct(
                    F.lit("+I").alias("row_kind"),
                    first(F.col("e.data")).alias("payload"),
                )
            )
        )
    )
    ex = parsed.withColumn("__r", F.explode(rows))
    return ex.select(
        *[F.col(f"__r.payload.{f.name}").alias(f.name) for f in payload_schema.fields],
        F.col("__r.row_kind").alias("row_kind"),
    )


def events_to_maxwell_json(
    events: DataFrame, db: str = "app", table: str = "events",
    staged: DataFrame | None = None,
) -> DataFrame:
    """Fixture events -> Maxwell JSON (one envelope per binlog EVENT):
    ``{"database","table","type":"insert|update|delete","ts":<epoch s>,
    "xid","data":{full new row},"old":{CHANGED columns' old values}}``.
    Maxwell's ``old`` is sparse — only columns whose value changed — which
    ``to_json``'s null-dropping produces naturally from a struct whose
    unchanged fields are null.
    ``staged``: see events_to_changelog_json."""
    s = _staged(events) if staged is None else staged
    mtype = (
        F.when(F.col("__app_op") == "delete", F.lit("delete"))
        .when(F.col("__live"), F.lit("update"))
        .otherwise(F.lit("insert"))
    )
    data = F.when(
        F.col("__app_op") == "delete", F.col("__prev_payload")
    ).otherwise(F.col("__payload"))
    changed = lambda f: F.when(  # noqa: E731
        ~F.col(f"__prev_payload.{f}").eqNullSafe(F.col(f"__payload.{f}")),
        F.col(f"__prev_payload.{f}"),
    )
    old = F.when(
        (F.col("__app_op") != "delete") & F.col("__live"),
        F.struct(
            changed("user_id").alias("user_id"),
            changed("value").alias("value"),
            changed("props").alias("props"),
        ),
    )
    envelope = F.struct(
        F.lit(db).alias("database"),
        F.lit(table).alias("table"),
        mtype.alias("type"),
        (F.unix_millis(F.col("ts")) / 1000).cast("long").alias("ts"),
        F.col("event_id").alias("xid"),
        data.alias("data"),
        old.alias("old"),
    )
    return s.select(F.to_json(envelope).alias("value"))


def events_to_ogg_json(
    events: DataFrame, db: str = "APP", table: str = "EVENTS",
    staged: DataFrame | None = None,
) -> DataFrame:
    """Fixture events -> Ogg (GoldenGate) JSON, the shape Flink's
    ``ogg-json`` format consumes: one envelope per EVENT; ``op_type`` is
    I/U/D; ``op_ts``/``current_ts`` are formatted timestamps; ``pos`` is a
    zero-padded, lexically ordered trail position (the GoldenGate analog of
    a binlog offset).
    ``staged``: see events_to_changelog_json."""
    s = _staged(events) if staged is None else staged
    otype = (
        F.when(F.col("__app_op") == "delete", F.lit("D"))
        .when(F.col("__live"), F.lit("U"))
        .otherwise(F.lit("I"))
    )
    before = F.when(
        (F.col("__app_op") == "delete") | F.col("__live"), F.col("__prev_payload")
    )
    after = F.when(F.col("__app_op") != "delete", F.col("__payload"))
    ts_str = F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
    envelope = F.struct(
        F.lit(f"{db}.{table}").alias("table"),
        otype.alias("op_type"),
        ts_str.alias("op_ts"),
        ts_str.alias("current_ts"),
        F.lpad(F.col("event_id").cast("string"), 20, "0").alias("pos"),
        F.array(F.lit("user_id")).alias("primary_keys"),
        before.alias("before"),
        after.alias("after"),
    )
    return s.select(F.to_json(envelope).alias("value"))


def parse_ogg_json(
    raw: DataFrame,
    value_col: str = "value",
    payload_schema: T.StructType = EVENT_PAYLOAD_SCHEMA,
) -> DataFrame:
    """Ogg JSON -> typed changelog rows with ``row_kind``: I -> +I from
    ``after``, D -> -D from ``before``, U -> (-U from ``before``, +U from
    ``after``) — the same expansion Flink's ogg-json format performs."""
    schema = T.StructType(
        [
            T.StructField("table", T.StringType(), True),
            T.StructField("op_type", T.StringType(), True),
            T.StructField("op_ts", T.StringType(), True),
            T.StructField("current_ts", T.StringType(), True),
            T.StructField("pos", T.StringType(), True),
            T.StructField("primary_keys", T.ArrayType(T.StringType()), True),
            T.StructField("before", payload_schema, True),
            T.StructField("after", payload_schema, True),
        ]
    )
    parsed = raw.select(F.from_json(F.col(value_col), schema).alias("e"))
    rows = (
        F.when(
            F.col("e.op_type") == "D",
            F.array(
                F.struct(
                    F.lit("-D").alias("row_kind"), F.col("e.before").alias("payload")
                )
            ),
        )
        .when(
            F.col("e.op_type") == "U",
            F.array(
                F.struct(
                    F.lit("-U").alias("row_kind"), F.col("e.before").alias("payload")
                ),
                F.struct(
                    F.lit("+U").alias("row_kind"), F.col("e.after").alias("payload")
                ),
            ),
        )
        .otherwise(
            F.array(
                F.struct(
                    F.lit("+I").alias("row_kind"), F.col("e.after").alias("payload")
                )
            )
        )
    )
    ex = parsed.withColumn("__r", F.explode(rows))
    return ex.select(
        *[F.col(f"__r.payload.{f.name}").alias(f.name) for f in payload_schema.fields],
        F.col("__r.row_kind").alias("row_kind"),
    )


def parse_maxwell_json(
    raw: DataFrame,
    value_col: str = "value",
    payload_schema: T.StructType = EVENT_PAYLOAD_SCHEMA,
) -> DataFrame:
    """Maxwell JSON -> typed changelog rows with ``row_kind``. The UPDATE
    before-image is ``data`` overlaid with the sparse ``old`` (per-field
    coalesce) — the standard Maxwell reconstruction, with its standard
    caveat that a column changed TO null is indistinguishable from an
    unchanged one (the fixture has no null payloads)."""
    schema = T.StructType(
        [
            T.StructField("database", T.StringType(), True),
            T.StructField("table", T.StringType(), True),
            T.StructField("type", T.StringType(), True),
            T.StructField("ts", T.LongType(), True),
            T.StructField("xid", T.LongType(), True),
            T.StructField("data", payload_schema, True),
            T.StructField("old", payload_schema, True),
        ]
    )
    parsed = raw.select(F.from_json(F.col(value_col), schema).alias("e"))
    before = F.struct(
        *[
            F.coalesce(F.col(f"e.old.{f.name}"), F.col(f"e.data.{f.name}")).alias(
                f.name
            )
            for f in payload_schema.fields
        ]
    )
    rows = (
        F.when(
            F.col("e.type") == "delete",
            F.array(
                F.struct(F.lit("-D").alias("row_kind"), F.col("e.data").alias("payload"))
            ),
        )
        .when(
            F.col("e.type") == "update",
            F.array(
                F.struct(F.lit("-U").alias("row_kind"), before.alias("payload")),
                F.struct(F.lit("+U").alias("row_kind"), F.col("e.data").alias("payload")),
            ),
        )
        .otherwise(
            F.array(
                F.struct(F.lit("+I").alias("row_kind"), F.col("e.data").alias("payload"))
            )
        )
    )
    ex = parsed.withColumn("__r", F.explode(rows))
    return ex.select(
        *[F.col(f"__r.payload.{f.name}").alias(f.name) for f in payload_schema.fields],
        F.col("__r.row_kind").alias("row_kind"),
    )
