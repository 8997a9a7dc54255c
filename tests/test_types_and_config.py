"""Type-lattice mapping (SURVEY §1.2) and source-config planning tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_cdc_connectors_spark.sources.source_config import SourceConfig
from flink_cdc_connectors_spark.sources.types import (
    map_source_type,
    set_to_array,
    table_schema,
    to_boolean,
    to_time_millis,
    to_timestamp_from_epoch,
)


@pytest.mark.parametrize(
    "decl,expected",
    [
        ("TINYINT(1)", T.BooleanType()),
        ("BIT(1)", T.BooleanType()),
        ("TINYINT", T.ByteType()),
        ("TINYINT UNSIGNED", T.ShortType()),
        ("SMALLINT", T.ShortType()),
        ("SMALLINT UNSIGNED", T.IntegerType()),
        ("INT", T.IntegerType()),
        ("INT UNSIGNED", T.LongType()),
        ("MEDIUMINT", T.IntegerType()),
        ("BIGINT", T.LongType()),
        ("BIGINT UNSIGNED", T.DecimalType(20, 0)),
        ("DECIMAL(12,2)", T.DecimalType(12, 2)),
        ("NUMERIC(40,2)", T.StringType()),  # p>38 -> string
        ("FLOAT", T.FloatType()),
        ("DOUBLE PRECISION", T.DoubleType()),
        ("VARCHAR(255)", T.StringType()),
        ("ENUM('a','b')", T.StringType()),
        ("JSON", T.StringType()),
        ("SET('x','y')", T.ArrayType(T.StringType())),
        ("VARBINARY(16)", T.BinaryType()),
        ("DATE", T.DateType()),
        ("TIME(3)", T.IntegerType()),
        ("DATETIME(6)", T.TimestampNTZType()),
        ("TIMESTAMP WITH TIME ZONE", T.TimestampType()),
        ("GEOMETRY", T.StringType()),
    ],
)
def test_type_lattice(decl, expected):
    assert map_source_type(decl) == expected


def test_table_schema_builder():
    st = table_schema([("id", "BIGINT"), ("name", "VARCHAR(64)"), ("w", "DECIMAL(10,3)")])
    assert [f.dataType for f in st.fields] == [
        T.LongType(),
        T.StringType(),
        T.DecimalType(10, 3),
    ]


def test_defensive_converters(spark):
    df = spark.createDataFrame(
        [("true", "1", 86_399_999, 86_399_999_000, 1_700_000_000_000, "a,b,c")],
        "b1 string, b2 string, t_ms long, t_us long, ts_ms long, s string",
    )
    row = df.select(
        to_boolean(F.col("b1")).alias("b1"),
        to_boolean(F.col("b2")).alias("b2"),
        to_time_millis(F.col("t_ms")).alias("t1"),
        to_time_millis(F.col("t_us")).alias("t2"),
        to_timestamp_from_epoch(F.col("ts_ms")).cast("string").alias("ts"),
        set_to_array(F.col("s")).alias("arr"),
    ).first()
    assert row["b1"] is True and row["b2"] is True
    assert row["t1"] == 86_399_999 and row["t2"] == 86_399_999
    assert row["ts"].startswith("2023-11-14")
    assert row["arr"] == ["a", "b", "c"]


def test_chunk_predicates_match_reference_shape():
    cfg = SourceConfig(snapshot_chunk_size=100)
    preds = cfg.snapshot_predicates("id", key_min=0, key_max=1000, row_count=1001)
    # distributionFactor = 1001/1001 = 1 -> step = 100
    assert preds[0] == "id <= 100"
    assert preds[1] == "id > 100 AND id <= 200"
    assert preds[-1].startswith("id > ")
    assert len(preds) == 11


def test_chunk_distribution_guard():
    cfg = SourceConfig()
    with pytest.raises(ValueError, match="distribution factor"):
        # sparse keys: factor = 10^9 range / 100 rows >> upper bound
        cfg.chunk_bounds(0, 1_000_000_000, 100)


def test_startup_modes_and_validation():
    assert SourceConfig(startup_mode="initial").startup_predicate() == "1=1"
    assert (
        SourceConfig(startup_mode="specific-offset", startup_offset=42).startup_predicate()
        == "event_id > 42"
    )
    assert "to_timestamp" in SourceConfig(
        startup_mode="timestamp", startup_timestamp_ms=1_700_000_000_000
    ).startup_predicate()
    with pytest.raises(ValueError):
        SourceConfig(startup_mode="bogus")
    with pytest.raises(ValueError):
        SourceConfig(startup_mode="specific-offset")


def test_discovery_regex_sharding():
    cfg = SourceConfig(database_pattern="app_db", table_pattern="user_[0-9]+")
    catalog = {
        "app_db": ["user_1", "user_2", "users", "orders"],
        "other": ["user_3"],
    }
    assert cfg.discover(catalog) == [("app_db", "user_1"), ("app_db", "user_2")]


def test_schema_history_versioning(spark):
    """DDL replay -> offset-versioned schemas; a reader decoding a split at
    offset X gets the schema current at X (SnapshotSplit.tableSchemas
    analog), and the history round-trips through its checkpoint JSON."""
    from flink_cdc_connectors_spark.sources.schema_history import SchemaHistory

    h = SchemaHistory()
    h.apply_ddl("app", "users", 0, "CREATE TABLE users (id BIGINT, name VARCHAR(64))")
    h.apply_ddl("app", "users", 100, "ALTER TABLE users ADD COLUMN bal DECIMAL(12,2)")
    h.apply_ddl("app", "users", 200, "ALTER TABLE users RENAME COLUMN name TO full_name")
    h.apply_ddl("app", "users", 300, "ALTER TABLE users DROP COLUMN bal")

    assert [f.name for f in h.schema_at("app", "users", 50)] == ["id", "name"]
    assert [f.name for f in h.schema_at("app", "users", 150)] == ["id", "name", "bal"]
    assert h.schema_at("app", "users", 150)["bal"].dataType == T.DecimalType(12, 2)
    assert [f.name for f in h.schema_at("app", "users", 250)] == ["id", "full_name", "bal"]
    assert [f.name for f in h.schema_at("app", "users", 999)] == ["id", "full_name"]
    assert h.schema_at("app", "users", -1) is None
    assert h.schema_at("app", "ghost", 100) is None

    # checkpoint round-trip preserves every version
    h2 = SchemaHistory.from_json(h.to_json())
    for off in (50, 150, 250, 999):
        assert h2.schema_at("app", "users", off) == h.schema_at("app", "users", off)

    # the versioned schema actually decodes data (createDataFrame gate)
    st = h.schema_at("app", "users", 150)
    import decimal
    df = spark.createDataFrame([(1, "x", decimal.Decimal("9.50"))], st)
    assert df.count() == 1

    with pytest.raises(ValueError, match="ALTER before CREATE"):
        SchemaHistory().apply_ddl("app", "t", 0, "ALTER TABLE t ADD COLUMN c INT")
    with pytest.raises(ValueError, match="unsupported DDL"):
        h.apply_ddl("app", "users", 400, "TRUNCATE TABLE users")


def test_mysql_doc_type_table_mapping():
    """Every concrete row of the reference's mysql-cdc.md Data Type Mapping
    table must agree with map_source_type (parameterized rows tested with
    concrete (p, s)/(n) substitutions; the geometry VALUE-example rows and
    the 'where p <= 38' annotation rows are not type rows)."""
    from pyspark.sql import types as T

    from flink_cdc_connectors_spark.sources.types import map_source_type

    # (MySQL declaration, expected Spark type) — transcribed 1:1 from the
    # doc table with p=10, s=2, n=16 where the table uses placeholders
    expected = [
        ("TINYINT", T.ByteType()),
        ("SMALLINT", T.ShortType()),
        ("TINYINT UNSIGNED", T.ShortType()),
        ("INT", T.IntegerType()),
        ("MEDIUMINT", T.IntegerType()),
        ("SMALLINT UNSIGNED", T.IntegerType()),
        ("BIGINT", T.LongType()),
        ("INT UNSIGNED", T.LongType()),
        ("MEDIUMINT UNSIGNED", T.LongType()),
        ("BIGINT UNSIGNED", T.DecimalType(20, 0)),
        ("SERIAL", T.DecimalType(20, 0)),
        ("FLOAT", T.FloatType()),
        ("FLOAT UNSIGNED", T.FloatType()),
        ("REAL", T.DoubleType()),
        ("DOUBLE", T.DoubleType()),
        ("DOUBLE PRECISION", T.DoubleType()),
        ("NUMERIC(10, 2)", T.DecimalType(10, 2)),
        ("DECIMAL(10, 2)", T.DecimalType(10, 2)),
        ("DECIMAL(10, 2) UNSIGNED", T.DecimalType(10, 2)),
        ("FIXED(10, 2)", T.DecimalType(10, 2)),
        ("DECIMAL(45, 2)", T.StringType()),  # 38 < p <= 65 -> STRING
        ("BOOLEAN", T.BooleanType()),
        ("TINYINT(1)", T.BooleanType()),
        ("BIT(1)", T.BooleanType()),
        ("BIT(9)", T.BinaryType()),  # BINARY(ceil(n/8))
        ("DATE", T.DateType()),
        ("CHAR(16)", T.StringType()),
        ("VARCHAR(255)", T.StringType()),
        ("BINARY(16)", T.BinaryType()),
        ("VARBINARY(32)", T.BinaryType()),
        ("TINYTEXT", T.StringType()),
        ("TEXT", T.StringType()),
        ("MEDIUMTEXT", T.StringType()),
        ("LONGTEXT", T.StringType()),
        ("TINYBLOB", T.BinaryType()),
        ("BLOB", T.BinaryType()),
        ("MEDIUMBLOB", T.BinaryType()),
        ("LONGBLOB", T.BinaryType()),
        ("YEAR", T.IntegerType()),
        ("ENUM", T.StringType()),
        ("JSON", T.StringType()),
        ("SET", T.ArrayType(T.StringType())),
        ("GEOMETRY", T.StringType()),
        ("POINT", T.StringType()),
        ("POLYGON", T.StringType()),
        ("GEOMETRYCOLLECTION", T.StringType()),
    ]
    for decl, want in expected:
        got = map_source_type(decl)
        assert got == want, f"{decl}: {got} != {want}"
    # TIMESTAMP/DATETIME land on the timestamp lattice point (Spark has no
    # parameterized precision); TIME has no Spark type -> millis-of-day int
    assert isinstance(map_source_type("TIMESTAMP(3)"), T.TimestampNTZType)
    assert isinstance(map_source_type("DATETIME(6)"), T.TimestampNTZType)
    assert isinstance(map_source_type("TIME(3)"), T.IntegerType)


def test_dialect_resolves_real_per_connector():
    """MySQL REAL is DOUBLE (mysql-cdc.md) but Postgres REAL/FLOAT4 is
    FLOAT (postgres-cdc.md:355-359) — the dialect parameter must resolve
    the conflict, and the DDL surface must thread the connector through."""
    from pyspark.sql import types as T

    from flink_cdc_connectors_spark.sources.ddl import parse_create_table
    from flink_cdc_connectors_spark.sources.types import map_source_type

    assert map_source_type("REAL", "mysql") == T.DoubleType()
    assert map_source_type("REAL", "postgres") == T.FloatType()
    assert map_source_type("FLOAT4", "postgres") == T.FloatType()
    assert map_source_type("FLOAT8", "postgres") == T.DoubleType()

    pg = parse_create_table(
        """CREATE TABLE t (r REAL, PRIMARY KEY (r) NOT ENFORCED)
           WITH ('connector' = 'postgres-cdc')"""
    )
    assert pg.spark_schema()["r"].dataType == T.FloatType()
    my = parse_create_table(
        """CREATE TABLE t (r REAL) WITH ('connector' = 'mysql-cdc')"""
    )
    assert my.spark_schema()["r"].dataType == T.DoubleType()


def _check_rows(dialect, rows):
    from flink_cdc_connectors_spark.sources.types import map_source_type

    for decl, want in rows:
        got = map_source_type(decl, dialect)
        assert got == want, f"[{dialect}] {decl}: {got} != {want}"


def test_postgres_doc_type_table_mapping():
    """postgres-cdc.md Data Type Mapping, concrete rows (p=10, s=2, n=16)."""
    from pyspark.sql import types as T

    _check_rows(
        "postgres",
        [
            ("SMALLINT", T.ShortType()),
            ("INT2", T.ShortType()),
            ("SMALLSERIAL", T.ShortType()),
            ("SERIAL2", T.ShortType()),
            ("INTEGER", T.IntegerType()),
            ("SERIAL", T.IntegerType()),
            ("BIGINT", T.LongType()),
            ("BIGSERIAL", T.LongType()),
            ("REAL", T.FloatType()),
            ("FLOAT4", T.FloatType()),
            ("FLOAT8", T.DoubleType()),
            ("DOUBLE PRECISION", T.DoubleType()),
            ("NUMERIC(10, 2)", T.DecimalType(10, 2)),
            ("DECIMAL(10, 2)", T.DecimalType(10, 2)),
            ("BOOLEAN", T.BooleanType()),
            ("DATE", T.DateType()),
            ("TIME WITHOUT TIMEZONE", T.IntegerType()),
            ("TIMESTAMP WITHOUT TIMEZONE", T.TimestampNTZType()),
            ("CHAR(16)", T.StringType()),
            ("CHARACTER(16)", T.StringType()),
            ("VARCHAR(16)", T.StringType()),
            ("CHARACTER VARYING(16)", T.StringType()),
            ("TEXT", T.StringType()),
            ("BYTEA", T.BinaryType()),
        ],
    )


def test_oracle_doc_type_table_mapping():
    """oracle-cdc.md: NUMBER precision tiers, DATE carries time, interval
    types, national/char LOBs."""
    from pyspark.sql import types as T

    _check_rows(
        "oracle",
        [
            ("NUMBER(2, 0)", T.ByteType()),      # p - s < 3
            ("NUMBER(4, 0)", T.ShortType()),     # p - s < 5
            ("NUMBER(9)", T.IntegerType()),      # p - s < 10
            ("NUMBER(18, 0)", T.LongType()),     # p - s < 19
            ("NUMBER(25, 0)", T.DecimalType(25, 0)),  # 19 <= p - s <= 38
            ("NUMBER(10, 2)", T.DecimalType(10, 2)),  # s > 0
            ("NUMBER(1)", T.BooleanType()),
            ("FLOAT", T.FloatType()),
            ("BINARY_FLOAT", T.FloatType()),
            ("DOUBLE PRECISION", T.DoubleType()),
            ("BINARY_DOUBLE", T.DoubleType()),
            ("DATE", T.TimestampNTZType()),      # Oracle DATE has time
            ("TIMESTAMP(6)", T.TimestampNTZType()),
            ("TIMESTAMP(6) WITH TIME ZONE", T.TimestampType()),
            ("TIMESTAMP(6) WITH LOCAL TIME ZONE", T.TimestampType()),
            ("CHAR(16)", T.StringType()),
            ("NCHAR(16)", T.StringType()),
            ("NVARCHAR2(16)", T.StringType()),
            ("VARCHAR(16)", T.StringType()),
            ("VARCHAR2(16)", T.StringType()),
            ("CLOB", T.StringType()),
            ("NCLOB", T.StringType()),
            ("XMLType", T.StringType()),
            ("SYS.XMLTYPE", T.StringType()),
            ("BLOB", T.BinaryType()),
            ("ROWID", T.BinaryType()),
            ("INTERVAL DAY TO SECOND", T.LongType()),
            ("INTERVAL YEAR TO MONTH", T.LongType()),
        ],
    )


def test_sqlserver_doc_type_table_mapping():
    """sqlserver-cdc.md: tinyint is unsigned (SMALLINT), float/real are
    DOUBLE, money types are decimals, datetimeoffset is LTZ."""
    from pyspark.sql import types as T

    _check_rows(
        "sqlserver",
        [
            ("char(16)", T.StringType()),
            ("varchar(16)", T.StringType()),
            ("nvarchar(16)", T.StringType()),
            ("nchar(16)", T.StringType()),
            ("text", T.StringType()),
            ("ntext", T.StringType()),
            ("xml", T.StringType()),
            ("decimal(10, 2)", T.DecimalType(10, 2)),
            ("money", T.DecimalType(19, 4)),
            ("smallmoney", T.DecimalType(10, 4)),
            ("float", T.DoubleType()),
            ("real", T.DoubleType()),
            ("bit", T.BooleanType()),
            ("int", T.IntegerType()),
            ("tinyint", T.ShortType()),
            ("smallint", T.ShortType()),
            ("bigint", T.LongType()),
            ("date", T.DateType()),
            ("time(3)", T.IntegerType()),
            ("datetime2", T.TimestampNTZType()),
            ("datetime", T.TimestampNTZType()),
            ("smalldatetime", T.TimestampNTZType()),
            ("datetimeoffset", T.TimestampType()),
        ],
    )


def test_db2_doc_type_table_mapping():
    """db2-cdc.md: REAL is FLOAT; CLOB/DBCLOB land on BYTES."""
    from pyspark.sql import types as T

    _check_rows(
        "db2",
        [
            ("SMALLINT", T.ShortType()),
            ("INTEGER", T.IntegerType()),
            ("BIGINT", T.LongType()),
            ("REAL", T.FloatType()),
            ("DOUBLE", T.DoubleType()),
            ("NUMERIC(10, 2)", T.DecimalType(10, 2)),
            ("DECIMAL(10, 2)", T.DecimalType(10, 2)),
            ("DATE", T.DateType()),
            ("TIME", T.IntegerType()),
            ("TIMESTAMP(6)", T.TimestampNTZType()),
            ("CHAR(16)", T.StringType()),
            ("VARCHAR(16)", T.StringType()),
            ("BINARY(16)", T.BinaryType()),
            ("VARBINARY(16)", T.BinaryType()),
            ("BLOB", T.BinaryType()),
            ("CLOB", T.BinaryType()),
            ("DBCLOB", T.BinaryType()),
            ("VARGRAPHIC", T.StringType()),
            ("XML", T.StringType()),
        ],
    )


def test_tidb_oceanbase_doc_type_table_mapping():
    """tidb/oceanbase-cdc.md: MySQL-family EXCEPT TIMESTAMP is LTZ, and
    REAL diverges between the two (TiDB: DOUBLE like MySQL; OceanBase's
    table: FLOAT)."""
    from pyspark.sql import types as T

    for d in ("tidb", "oceanbase"):
        _check_rows(
            d,
            [
                ("TINYINT", T.ByteType()),
                ("BIGINT UNSIGNED", T.DecimalType(20, 0)),
                ("TIMESTAMP", T.TimestampType()),    # LTZ, unlike mysql
                ("TIMESTAMP(3)", T.TimestampType()),
                ("DATETIME(3)", T.TimestampNTZType()),
                ("BIT(9)", T.BinaryType()),
                ("SET", T.ArrayType(T.StringType())),
                ("YEAR", T.IntegerType()),
            ],
        )
    from flink_cdc_connectors_spark.sources.types import map_source_type

    assert map_source_type("REAL", "tidb") == T.DoubleType()
    assert map_source_type("REAL", "oceanbase") == T.FloatType()


def test_mongodb_doc_type_table_mapping():
    """mongodb-cdc.md: BSON scalar names (schema-dependent Object/Array/
    DBPointer/GeoJSON rows need per-document schemas and are out of the
    scalar lattice)."""
    from pyspark.sql import types as T

    _check_rows(
        "mongodb",
        [
            ("Int", T.IntegerType()),   # mongodb-cdc.md:460-462
            ("Long", T.LongType()),
            ("Double", T.DoubleType()),
            ("Decimal128", T.DecimalType(38, 18)),
            ("Boolean", T.BooleanType()),
            ("Date", T.TimestampType()),
            ("Timestamp", T.TimestampType()),
            ("String", T.StringType()),
            ("ObjectId", T.StringType()),
            ("UUID", T.StringType()),
            ("Symbol", T.StringType()),
            ("MD5", T.StringType()),
            ("JavaScript", T.StringType()),
            ("Regex", T.StringType()),
            ("BinData", T.BinaryType()),
        ],
    )


def test_specific_offset_accepts_gtid_set_form():
    """specific-offset startup accepts EITHER file/pos OR a GTID set
    (MySqlSourceOptions.java:150-166); the set string is parse-validated."""
    from flink_cdc_connectors_spark.sources.ddl import (
        parse_create_table,
        to_source_config,
    )

    ddl = """
    CREATE TABLE t (a BIGINT, PRIMARY KEY (a) NOT ENFORCED)
    WITH ('connector' = 'mysql-cdc', 'hostname' = 'h', 'username' = 'u',
          'password' = 'p', 'database-name' = 'd', 'table-name' = 't',
          'scan.startup.mode' = 'specific-offset',
          'scan.startup.specific-offset.gtid-set'
            = '24da167-0c0c-11e8-8442-00059a3c7b00:1-19',
          'scan.startup.specific-offset.skip-events' = '3',
          'scan.startup.specific-offset.skip-rows' = '1')
    """
    cfg = to_source_config(parse_create_table(ddl))
    assert cfg.startup_gtid_set.endswith(":1-19")
    assert (cfg.startup_skip_events, cfg.startup_skip_rows) == (3, 1)
    assert cfg.startup_offset is None


def test_specific_offset_requires_pos_or_gtid():
    import pytest as _pytest

    from flink_cdc_connectors_spark.sources.source_config import SourceConfig

    with _pytest.raises(ValueError, match="startup_offset .*startup_gtid_set"):
        SourceConfig(startup_mode="specific-offset")
    # empty/whitespace GTID set = no usable position -> construction fails
    with _pytest.raises(ValueError, match="startup_gtid_set"):
        SourceConfig(startup_mode="specific-offset", startup_gtid_set="  ")
    # either form alone validates
    SourceConfig(startup_mode="specific-offset", startup_offset=4)
    SourceConfig(
        startup_mode="specific-offset",
        startup_gtid_set="24da167-0c0c-11e8-8442-00059a3c7b00:1-19",
    )


def test_server_id_threads_and_validates():
    """server-id threads from DDL and is parse-validated at config build
    (ServerIdRange.java:30-90) — a malformed range fails construction, not
    subtask assignment."""
    import pytest as _pytest

    from flink_cdc_connectors_spark.sources.ddl import (
        parse_create_table,
        to_source_config,
    )
    from flink_cdc_connectors_spark.sources.source_config import SourceConfig

    ddl = """
    CREATE TABLE t (a BIGINT, PRIMARY KEY (a) NOT ENFORCED)
    WITH ('connector' = 'mysql-cdc', 'hostname' = 'h', 'username' = 'u',
          'password' = 'p', 'database-name' = 'd', 'table-name' = 't',
          'server-id' = '5400-5404')
    """
    assert to_source_config(parse_create_table(ddl)).server_id == "5400-5404"
    with _pytest.raises(Exception, match="server-id"):
        SourceConfig(server_id="5404-5400")
    with _pytest.raises(Exception, match="server-id"):
        SourceConfig(server_id="abc")


def test_even_split_reference_fixture_cases():
    """The two concrete splits from the reference's own splitter suite
    (MySqlChunkSplitterTest.java:29-59): boundaries at the Integer.MAX
    edge — the 'overflow' case yields two chunks, the 'normal' case
    three, with the exact bounds the reference asserts."""
    from flink_cdc_connectors_spark.sources.source_config import SourceConfig

    cfg = SourceConfig(snapshot_chunk_size=10)
    imax = 2_147_483_647
    # testSplitEvenlySizedChunksOverflow: min = MAX-19, max = MAX, 20 rows
    assert cfg.chunk_bounds(imax - 19, imax, 20) == [
        (None, 2_147_483_638),
        (2_147_483_638, None),
    ]
    # testSplitEvenlySizedChunksNormal: min = MAX-20, max = MAX, 20 rows
    assert cfg.chunk_bounds(imax - 20, imax, 20) == [
        (None, 2_147_483_637),
        (2_147_483_637, 2_147_483_647),
        (2_147_483_647, None),
    ]


def test_schema_history_type_change_marks_resnapshot_boundary():
    """MODIFY COLUMN versions the schema like any DDL (the
    FlinkJsonTableChangeSerializer column-type round-trip) AND marks a
    re-snapshot boundary: old row images cannot be conformed by
    projection. Boundaries survive the checkpoint JSON; a same-type
    MODIFY is a no-op, not a boundary; pre-round-6 (bare-map) checkpoint
    documents still restore."""
    from flink_cdc_connectors_spark.sources.schema_history import SchemaHistory

    h = SchemaHistory()
    h.apply_ddl("app", "t", 0, "CREATE TABLE t (id INT, amt DECIMAL(10,2))")
    h.apply_ddl("app", "t", 100, "ALTER TABLE t MODIFY id BIGINT")
    h.apply_ddl("app", "t", 100, "ALTER TABLE t MODIFY amt DECIMAL(18,4)")
    h.apply_ddl("app", "t", 200, "ALTER TABLE t MODIFY amt DECIMAL(18,4)")  # no-op
    h.apply_ddl("app", "t", 300, "ALTER TABLE t ADD COLUMN note VARCHAR(10)")

    assert h.schema_at("app", "t", 50)["id"].dataType == T.IntegerType()
    assert h.schema_at("app", "t", 150)["id"].dataType == T.LongType()
    assert h.schema_at("app", "t", 50)["amt"].dataType == T.DecimalType(10, 2)
    assert h.schema_at("app", "t", 150)["amt"].dataType == T.DecimalType(18, 4)
    # one ALTER batch at one offset = one boundary; no-op and ADD are not
    assert h.type_change_offsets("app", "t") == [100]

    h2 = SchemaHistory.from_json(h.to_json())
    assert h2.type_change_offsets("app", "t") == [100]
    assert h2.schema_at("app", "t", 150) == h.schema_at("app", "t", 150)

    # pre-round-6 checkpoint: bare versions map, no type_changes key
    import json

    legacy = json.dumps(json.loads(h.to_json())["versions"])
    h3 = SchemaHistory.from_json(legacy)
    assert h3.schema_at("app", "t", 150) == h.schema_at("app", "t", 150)
    assert h3.type_change_offsets("app", "t") == []

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown column"):
        h.apply_ddl("app", "t", 400, "ALTER TABLE t MODIFY ghost BIGINT")
