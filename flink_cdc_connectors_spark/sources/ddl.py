"""Flink-SQL DDL surface: ``CREATE TABLE ... WITH ('connector'='*-cdc')``.

The reference's primary user interface is a Flink SQL DDL statement
(README.md:27-56; every connector doc opens with one — mysql-cdc.md,
postgres-cdc.md, mongodb-cdc.md): column list with optional METADATA
columns, ``PRIMARY KEY ... NOT ENFORCED``, and a WITH-options clause
carrying connection/startup/chunking options. A user switching engines
brings that DDL with them, so this module accepts it verbatim:

  - :func:`parse_create_table` — DDL text -> :class:`TableDef` (columns
    typed through the §1.2 lattice in ``sources/types.py``, metadata
    columns, primary keys, raw options);
  - :func:`to_source_config` — WITH-options -> the validated
    :class:`SourceConfig` (same option keys as MySqlSourceOptions.java);
  - :func:`create_cdc_table` — bind the declared table to the engine: the
    ``table-name`` regex discovers fixture tables (TableDiscoveryUtils
    analog), the startup mode compiles to an offset predicate, declared
    metadata columns are appended (MySqlReadableMetadata.java:33-70), the
    declared physical columns are projected/cast (absent ones surface as
    typed NULLs — schema conformance), and the result registers as a temp
    view under the DDL name so ``spark.sql`` queries run against it
    exactly as Flink SQL queries run against the reference's table.

Parsing is a small recursive-descent-free splitter (comma at paren depth
zero), not a full SQL grammar — it covers the DDL forms the reference's
docs and ITCases actually use.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_cdc_connectors_spark.sources.source_config import SourceConfig
from flink_cdc_connectors_spark.sources.types import map_source_type

_CREATE_RE = re.compile(
    r"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.`\"]+)\s*"
    r"\((?P<body>.*)\)\s*WITH\s*\((?P<options>.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_OPTION_RE = re.compile(r"'(?P<k>[^']+)'\s*=\s*'(?P<v>[^']*)'")
_META_RE = re.compile(
    r"^(?P<name>[\w`\"]+)\s+(?P<type>.+?)\s+METADATA"
    r"(?:\s+FROM\s+'(?P<key>[^']+)')?(?:\s+VIRTUAL)?$",
    re.IGNORECASE,
)
_PK_RE = re.compile(
    r"^PRIMARY\s+KEY\s*\((?P<cols>[^)]*)\)(?:\s+NOT\s+ENFORCED)?$", re.IGNORECASE
)
_WATERMARK_RE = re.compile(
    r"^WATERMARK\s+FOR\s+(?P<col>[\w`\"]+)\s+AS\s+(?P<expr>.+)$", re.IGNORECASE
)


def _ident(s: str) -> str:
    return s.strip().strip('`"')


def _split_top(body: str) -> list[str]:
    """Split on commas at parenthesis depth 0 (DECIMAL(10, 5) stays whole)."""
    parts, depth, buf = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        parts.append(tail)
    return parts


@dataclass(frozen=True)
class TableDef:
    """A parsed CDC table declaration."""

    name: str
    columns: list[tuple[str, str]]  # physical (name, Flink/SQL type decl)
    metadata_columns: list[tuple[str, str, str]]  # (name, type decl, metadata key)
    primary_keys: list[str]
    watermark: tuple[str, str] | None  # (column, expression) — informational
    options: dict[str, str]

    def dialect(self) -> str:
        """Type-resolution dialect from the connector option (mysql-cdc ->
        'mysql'); unknown/absent connectors resolve with MySQL rules."""
        return self.options.get("connector", "mysql-cdc").removesuffix("-cdc")

    def spark_schema(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(n, map_source_type(d, self.dialect()), nullable=True)
                for n, d in self.columns
            ]
        )


def parse_create_table(ddl: str) -> TableDef:
    """Flink ``CREATE TABLE`` DDL text -> :class:`TableDef`."""
    m = _CREATE_RE.search(ddl.strip())
    if not m:
        raise ValueError("not a CREATE TABLE ... ( ... ) WITH ( ... ) statement")
    name = _ident(m.group("name")).split(".")[-1]
    options = {o.group("k"): o.group("v") for o in _OPTION_RE.finditer(m.group("options"))}
    columns: list[tuple[str, str]] = []
    meta: list[tuple[str, str, str]] = []
    pks: list[str] = []
    watermark: tuple[str, str] | None = None
    for item in _split_top(m.group("body")):
        if (pk := _PK_RE.match(item)) is not None:
            pks = [_ident(c) for c in pk.group("cols").split(",")]
            continue
        if (wm := _WATERMARK_RE.match(item)) is not None:
            watermark = (_ident(wm.group("col")), wm.group("expr").strip())
            continue
        if (mm := _META_RE.match(item)) is not None:
            col = _ident(mm.group("name"))
            meta.append((col, mm.group("type").strip(), mm.group("key") or col))
            continue
        col, _, decl = item.partition(" ")
        if not decl:
            raise ValueError(f"unparseable column item: {item!r}")
        columns.append((_ident(col), decl.strip()))
    return TableDef(name, columns, meta, pks, watermark, options)


# Per-connector REQUIRED options — each factory's requiredOptions():
# mysql   MySqlTableSourceFactory.java:158-166
# postgres PostgreSQLTableFactory.java:160-169
# mongodb MongoDBTableSourceFactory.java:131-135
# oracle  OracleTableSourceFactory.java:134-142
# sqlserver SqlServerTableFactory.java:138-147
# db2     Db2TableSourceFactory.java (hostname/db/schema/table/user/pass)
# tidb    TDBSourceOptions.java:54-66 (database/table/pd-addresses)
# oceanbase OceanBaseTableSourceFactory.java (startup/user/pass/tenant/logproxy)
REQUIRED_OPTIONS: dict[str, frozenset[str]] = {
    "mysql-cdc": frozenset(
        {"hostname", "username", "password", "database-name", "table-name"}
    ),
    "postgres-cdc": frozenset(
        {"hostname", "username", "password", "database-name", "schema-name", "table-name"}
    ),
    "mongodb-cdc": frozenset({"hosts"}),
    "oracle-cdc": frozenset(
        {"username", "password", "database-name", "schema-name", "table-name"}
    ),
    "sqlserver-cdc": frozenset(
        {"hostname", "username", "password", "database-name", "schema-name", "table-name"}
    ),
    "db2-cdc": frozenset(
        {"hostname", "username", "password", "database-name", "schema-name", "table-name"}
    ),
    "tidb-cdc": frozenset({"database-name", "table-name", "pd-addresses"}),
    "oceanbase-cdc": frozenset(
        {"scan.startup.mode", "username", "password", "tenant-name",
         "logproxy.host", "logproxy.port"}
    ),
}


# Per-connector SUPPORTED option names — the factory's
# requiredOptions() + optionalOptions(), transcribed per connector from its
# doc's Connector Options table and the *SourceOptions.java definitions
# (no shared pool: granting one connector's options to another would
# accept exactly the porting mistakes this validation exists to catch).
# The reference's FactoryUtil rejects any option a factory does not
# consume ("Unsupported options"); validate_options mirrors that so a
# typo like 'table-nmae' fails loudly instead of silently binding
# everything.
SUPPORTED_OPTIONS: dict[str, frozenset[str]] = {
    # MySqlSourceOptions.java:30-247 / mysql-cdc.md Connector Options
    "mysql-cdc": frozenset(
        {
            "connector", "hostname", "port", "username", "password",
            "database-name", "table-name", "server-id", "server-time-zone",
            "scan.startup.mode", "scan.startup.timestamp-millis",
            "scan.startup.specific-offset.file",
            "scan.startup.specific-offset.pos",
            "scan.startup.specific-offset.gtid-set",
            "scan.startup.specific-offset.skip-events",
            "scan.startup.specific-offset.skip-rows",
            "scan.incremental.snapshot.enabled",
            "scan.incremental.snapshot.chunk.size",
            "scan.incremental.snapshot.chunk.key-column",
            "scan.snapshot.fetch.size",
            "chunk-meta.group.size",
            "chunk-key.even-distribution.factor.upper-bound",
            "chunk-key.even-distribution.factor.lower-bound",
            "connect.timeout", "connect.max-retries", "connection.pool.size",
            "heartbeat.interval",
            # newly-added-tables at restore (MySqlSourceOptions.java:232-238)
            # + the repo's capture-set axis the streaming binding maps it to
            "scan.newly-added-table.enabled",
            "scan.captured.key-ranges",
        }
    ),
    # PostgreSQLTableFactory.java / postgres-cdc.md
    "postgres-cdc": frozenset(
        {
            "connector", "hostname", "port", "username", "password",
            "database-name", "schema-name", "table-name", "slot.name",
            "decoding.plugin.name", "changelog-mode",
        }
    ),
    # MongoDBSourceOptions.java:27-130 / mongodb-cdc.md; database-name and
    # table-name are ENGINE aliases for the database/collection axes (our
    # binding names), accepted alongside the canonical spellings
    "mongodb-cdc": frozenset(
        {
            "connector", "hosts", "username", "password", "database",
            "collection", "database-name", "table-name",
            "connection.options", "copy.existing", "copy.existing.queue.size",
            "batch.size", "poll.max.batch.size", "poll.await.time.ms",
            "heartbeat.interval.ms", "scan.incremental.snapshot.enabled",
            "scan.incremental.snapshot.chunk.size.mb",
        }
    ),
    # OracleSourceOptions / oracle-cdc.md
    "oracle-cdc": frozenset(
        {
            "connector", "hostname", "port", "username", "password", "url",
            "database-name", "schema-name", "table-name",
            "scan.startup.mode", "scan.incremental.snapshot.enabled",
            "scan.incremental.snapshot.chunk.size",
            "scan.incremental.snapshot.chunk.key-column",
            "scan.snapshot.fetch.size",
            "connect.max-retries", "connection.pool.size",
        }
    ),
    # SqlServerSourceOptions / sqlserver-cdc.md
    "sqlserver-cdc": frozenset(
        {
            "connector", "hostname", "port", "username", "password",
            "database-name", "schema-name", "table-name", "server-time-zone",
            "scan.startup.mode",
        }
    ),
    # Db2TableSourceFactory / db2-cdc.md
    "db2-cdc": frozenset(
        {
            "connector", "hostname", "port", "username", "password",
            "database-name", "schema-name", "table-name", "server-time-zone",
            "scan.startup.mode",
        }
    ),
    # TDBSourceOptions.java:54-96 / tidb-cdc.md
    "tidb-cdc": frozenset(
        {
            "connector", "database-name", "table-name", "pd-addresses",
            "scan.startup.mode", "host-mapping",
            "tikv.grpc.timeout_in_ms", "tikv.grpc.scan_timeout_in_ms",
            "tikv.batch_get_concurrency", "tikv.batch_put_concurrency",
            "tikv.batch_scan_concurrency", "tikv.batch_delete_concurrency",
        }
    ),
    # OceanBaseTableSourceFactory / oceanbase-cdc.md (its timestamp option
    # is 'scan.startup.timestamp' in SECONDS — the MySQL-spelled
    # 'scan.startup.timestamp-millis' must NOT pass here)
    "oceanbase-cdc": frozenset(
        {
            "connector", "scan.startup.mode", "scan.startup.timestamp",
            "username", "password", "tenant-name", "database-name",
            "table-name", "table-list", "hostname", "port",
            "logproxy.host", "logproxy.port", "logproxy.client.id",
            "rootserver-list", "config-url", "working-mode",
            "server-time-zone", "connect.timeout",
        }
    ),
}

# Option namespaces passed through to the underlying engine verbatim
# (Flink forwards 'debezium.*' to the embedded Debezium and
# 'jdbc.properties.*' to the driver — never validated by the factory).
_PASSTHROUGH_PREFIXES = ("debezium.", "jdbc.properties.")


def validate_options(tdef: TableDef) -> None:
    """The factory ``validate()`` behavior: a known CDC connector must
    carry its required options; missing ones are reported together, the
    way Flink's FactoryUtil lists them."""
    connector = tdef.options.get("connector", "")
    if not connector.endswith("-cdc"):
        raise ValueError(f"not a CDC connector: {connector!r}")
    required = REQUIRED_OPTIONS.get(connector)
    if required is not None:
        missing = sorted(required - tdef.options.keys())
        if missing:
            raise ValueError(
                f"One or more required options are missing for connector "
                f"'{connector}': {', '.join(missing)}"
            )
    # FactoryUtil validates declared options FIRST, then rejects unconsumed
    # keys — same order here so a truncated+typo'd DDL reports the missing
    # required options, not the typo
    supported = SUPPORTED_OPTIONS.get(connector)
    if supported is not None:
        unknown = {
            k
            for k in tdef.options
            if k not in supported and not k.startswith(_PASSTHROUGH_PREFIXES)
        }
        if unknown:
            raise ValueError(
                f"Unsupported options for connector '{connector}': "
                f"{', '.join(sorted(unknown))} (FactoryUtil-style rejection; "
                f"debezium.*/jdbc.properties.* pass through)"
            )


def to_source_config(tdef: TableDef) -> SourceConfig:
    """WITH-options -> validated :class:`SourceConfig` (the option keys of
    MySqlSourceOptions.java:30-247 / SourceOptions.java:40-113); required
    options enforced per connector first (:func:`validate_options`)."""
    validate_options(tdef)
    o = tdef.options
    kw: dict = {}
    if "hostname" in o:
        kw["hostname"] = o["hostname"]
    if "port" in o:
        kw["port"] = int(o["port"])
    if "username" in o:
        kw["username"] = o["username"]
    if "password" in o:
        kw["password"] = o["password"]
    if "database-name" in o:
        kw["database_pattern"] = o["database-name"]
    elif "database" in o:  # MongoDB's spelling (MongoDBSourceOptions.java:51)
        kw["database_pattern"] = o["database"]
    if "table-name" in o:
        kw["table_pattern"] = o["table-name"]
    elif "collection" in o:  # MongoDB's table axis (MongoDBSourceOptions.java:57)
        kw["table_pattern"] = o["collection"]
    else:
        # no table binding declared (mongodb-cdc requires only 'hosts');
        # create_cdc_table/create_cdc_stream reject this clearly
        kw["table_pattern"] = None
    if "server-id" in o:
        kw["server_id"] = o["server-id"]
    if "scan.startup.mode" in o:
        kw["startup_mode"] = o["scan.startup.mode"]
    if "scan.startup.specific-offset.pos" in o:
        kw["startup_offset"] = int(o["scan.startup.specific-offset.pos"])
    if "scan.startup.specific-offset.gtid-set" in o:
        kw["startup_gtid_set"] = o["scan.startup.specific-offset.gtid-set"]
    if "scan.startup.specific-offset.skip-events" in o:
        kw["startup_skip_events"] = int(o["scan.startup.specific-offset.skip-events"])
    if "scan.startup.specific-offset.skip-rows" in o:
        kw["startup_skip_rows"] = int(o["scan.startup.specific-offset.skip-rows"])
    if "scan.startup.timestamp-millis" in o:
        kw["startup_timestamp_ms"] = int(o["scan.startup.timestamp-millis"])
    if "scan.incremental.snapshot.chunk.size" in o:
        kw["snapshot_chunk_size"] = int(o["scan.incremental.snapshot.chunk.size"])
    if "scan.incremental.snapshot.chunk.key-column" in o:
        # factory passthrough (MySqlTableSourceFactory.java:147-149 /
        # OracleTableSourceFactory.java:89-91); PK-membership validation
        # happens at split planning (operators/cdc.py::get_chunk_key_column)
        # where the table's primary key is known, as in ChunkUtils
        kw["chunk_key_column"] = o["scan.incremental.snapshot.chunk.key-column"]
    if "scan.snapshot.fetch.size" in o:
        kw["fetch_size"] = int(o["scan.snapshot.fetch.size"])
    if "chunk-meta.group.size" in o:
        kw["split_meta_group_size"] = int(o["chunk-meta.group.size"])
    # even-split guard bounds (SourceOptions.java:99-113; MySqlChunkSplitter
    # falls back to uneven splitting outside them)
    if "chunk-key.even-distribution.factor.upper-bound" in o:
        kw["distribution_factor_upper"] = float(
            o["chunk-key.even-distribution.factor.upper-bound"]
        )
    if "chunk-key.even-distribution.factor.lower-bound" in o:
        kw["distribution_factor_lower"] = float(
            o["chunk-key.even-distribution.factor.lower-bound"]
        )
    if "copy.existing" in o:
        # mongodb-cdc legacy initial load toggle (semantics modeled by
        # cdc_mongo_copy_existing); boolean-typed like the reference's
        # Options.key("copy.existing").booleanType()
        kw["copy_existing"] = o["copy.existing"].strip().lower() == "true"
    if "debezium.max.batch.size" in o:
        # debezium.* passthrough the streaming binding honors: events per
        # poll -> stream-phase offsets per micro-batch (datasource.py
        # maxOffsetsPerBatch)
        kw["max_batch_size"] = int(o["debezium.max.batch.size"])
    if "scan.newly-added-table.enabled" in o:
        # MySqlSourceOptions.java:232-238 — newly regex-matched tables get
        # snapshot splits at restore (suspend/backfill/resume)
        kw["scan_newly_added_table"] = (
            o["scan.newly-added-table.enabled"].strip().lower() == "true"
        )
    if "scan.captured.key-ranges" in o:
        # repo extension: the capture set as half-open key ranges (the
        # single-table fixture's table axis); the streaming binding
        # forwards it to the DSv2 source's keyRanges option, whose offset
        # v3 capture-set diff drives the newly-added/narrowed protocols
        kw["captured_key_ranges"] = o["scan.captured.key-ranges"]
    if "server-time-zone" in o:
        kw["server_time_zone"] = o["server-time-zone"]
    if "slot.name" in o:
        kw["slot_name"] = o["slot.name"]
    elif o.get("connector") == "postgres-cdc":
        # PostgreSQLSource Builder defaults slotName to "flink"
        kw["slot_name"] = "flink"
    return SourceConfig(**kw)


# metadata key -> column builder (MySqlReadableMetadata.java:33-70); the
# simulation binds database_name to the config's database pattern (a
# concrete name in the docs' DDLs) and op_ts to the row's event time.
def _metadata_col(
    key: str,
    table: str,
    cfg: SourceConfig,
    df: DataFrame,
    options: dict[str, str] | None = None,
):
    """Virtual metadata column values — the union of every connector's
    ReadableMetadata surface: MySQL exposes database/table/op_ts
    (MySqlReadableMetadata.java:33-70); Postgres/Oracle/SQLServer/Db2 add
    schema_name (SqlServerReadableMetadata.java); MongoDB names the table
    axis collection_name; OceanBase adds tenant_name (its DDL examples use
    `tenant STRING METADATA FROM 'tenant_name'`, oceanbase-cdc.md)."""
    opts = options or {}
    if key == "database_name":
        return F.lit(cfg.database_pattern)
    if key in ("table_name", "collection_name"):
        return F.lit(table)
    if key == "schema_name":
        return F.lit(opts.get("schema-name"))
    if key == "tenant_name":
        return F.lit(opts.get("tenant-name"))
    if key == "op_ts":
        return F.col("ts") if "ts" in df.columns else F.lit(None).cast("timestamp")
    raise ValueError(f"unsupported metadata key: {key!r}")


def create_cdc_table(
    spark: SparkSession, ddl: str, sf_dir: str, register_view: bool = True
) -> DataFrame:
    """Bind a Flink CDC ``CREATE TABLE`` statement to the engine.

    Discovery: the ``table-name`` option is a regex over the fixture
    catalog (TableDiscoveryUtils analog; sharding regexes union multiple
    physical tables into the one logical stream). Startup: the configured
    mode compiles to the offset predicate of ``SourceConfig
    .startup_predicate`` on offset-bearing tables. Projection: declared
    physical columns are cast to their lattice types; declared columns the
    source lacks surface as typed NULLs (the schema-conformance rule the
    DSv2 reader applies across DDL versions); metadata columns append
    last. The result optionally registers as a temp view under the DDL
    table name, so ``spark.sql`` runs against it like Flink SQL."""
    from flink_cdc_connectors_spark import TABLES
    from flink_cdc_connectors_spark.sources.loaders import load_table

    tdef = parse_create_table(ddl)
    cfg = to_source_config(tdef)
    if cfg.table_pattern is None:
        # connectors whose required options omit table-name (e.g.
        # mongodb-cdc needs only 'hosts') pass validate_options; binding to
        # fixture tables still needs an explicit pattern
        raise ValueError("binding requires a 'table-name' option")
    pat = re.compile(cfg.table_pattern)
    matches = [t for t in TABLES if pat.fullmatch(t)]
    if not matches:
        raise ValueError(f"table-name regex matches no tables: {cfg.table_pattern!r}")
    parts = []
    for t in matches:
        df = load_table(spark, sf_dir, t)
        if "event_id" in df.columns:
            if cfg.startup_mode == "latest-offset":
                # resolved against the current max offset (one driver scalar)
                cur_max = df.agg(F.max("event_id")).first()[0]
                df = df.filter(F.col("event_id") > F.lit(cur_max))
            elif (pred := cfg.startup_predicate()) != "1=1":
                df = df.filter(F.expr(pred))
        cols = []
        for name, decl in tdef.columns:
            target = map_source_type(decl, tdef.dialect())
            if name in df.columns:
                cols.append(F.col(name).cast(target).alias(name))
            else:
                cols.append(F.lit(None).cast(target).alias(name))
        for name, decl, key in tdef.metadata_columns:
            cols.append(
                _metadata_col(key, t, cfg, df, tdef.options)
                .cast(map_source_type(decl, tdef.dialect()))
                .alias(name)
            )
        parts.append(df.select(*cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if register_view:
        out.createOrReplaceTempView(tdef.name)
    return out


def create_cdc_stream(
    spark: SparkSession, ddl: str, sf_dir: str, num_chunks: int = 4
) -> DataFrame:
    """Bind a Flink CDC ``CREATE TABLE`` statement to the STREAMING engine:
    the same DDL that drives :func:`create_cdc_table` configures the
    ``cdc_binlog`` DataSource V2 source (sources/datasource.py — parallel
    chunked snapshot phase, shouldEmit stream phase, checkpointable offset
    JSON). This is the Flink-semantics path: the DDL declares a TABLE, the
    runtime produces an unbounded changelog. The ``table-name`` regex must
    resolve to exactly ONE stream table here (multi-table streams route
    through ``parse_debezium_json_multi`` after this source).

    Returns the streaming DataFrame; compose with ``writeStream`` (e.g.
    ``foreachBatch`` + ``streaming/changelog.py`` materialization)."""
    from flink_cdc_connectors_spark import TABLES
    from flink_cdc_connectors_spark.sources import datasource

    datasource.register(spark)  # idempotent DSv2 provider registration
    tdef = parse_create_table(ddl)
    cfg = to_source_config(tdef)
    if cfg.table_pattern is None:
        # connectors whose required options omit table-name (e.g.
        # mongodb-cdc needs only 'hosts') pass validate_options; binding to
        # fixture tables still needs an explicit pattern
        raise ValueError("binding requires a 'table-name' option")
    pat = re.compile(cfg.table_pattern)
    matches = [t for t in TABLES if pat.fullmatch(t)]
    if len(matches) != 1:
        raise ValueError(
            f"streaming binding needs exactly one table, regex matched {matches!r}"
        )
    reader = (
        spark.readStream.format("cdc_binlog")
        .option("path", f"{sf_dir}/{matches[0]}.parquet")
        .option("numChunks", num_chunks)
        .option("database", cfg.database_pattern)
        .option("table", matches[0])
        .option("startupMode", cfg.startup_mode)
    )
    if cfg.startup_mode == "specific-offset":
        reader = reader.option("startupOffset", cfg.startup_offset)
    elif cfg.startup_mode == "timestamp":
        reader = reader.option("startupTimestampMs", cfg.startup_timestamp_ms)
    if cfg.max_batch_size is not None:
        reader = reader.option("maxOffsetsPerBatch", cfg.max_batch_size)
    if cfg.captured_key_ranges is not None:
        # the explicit capture set (one key range per "table"): offset
        # documents then carry it, and a restart with a WIDER
        # 'scan.captured.key-ranges' drives the newly-added-table backfill
        # ONLY when 'scan.newly-added-table.enabled' = 'true' — the flag
        # gates restart-time discovery exactly as in the reference
        # (MySqlSourceOptions.java:232-238); with it unset/false a widened
        # list leaves the new range uncaptured. Narrowing (a dropped range
        # stops emitting) is the capture filter itself and is not gated.
        reader = reader.option("keyRanges", cfg.captured_key_ranges)
        reader = reader.option(
            "newlyAddedTables", "true" if cfg.scan_newly_added_table else "false"
        )
    return reader.load()
