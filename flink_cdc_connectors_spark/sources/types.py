"""Source-database type mapping — the reference's type lattice (SURVEY §1.2).

Maps source DDL type declarations to Spark types the way the reference maps
them to the Flink SQL lattice at schema-discovery time
(flink-connector-mysql-cdc/.../schema/MySqlTypeUtils.java:108-181; doc
tables docs/content/connectors/mysql-cdc.md:701, postgres-cdc.md:311,
mongodb-cdc.md:431). Conventions pinned here:

  - unsigned integer promotion: TINYINT UNSIGNED->Short, SMALLINT
    UNSIGNED->Int, INT UNSIGNED->Long, BIGINT UNSIGNED->Decimal(20,0)
    (MySqlTypeUtils.java:110-128)
  - TINYINT(1)/BIT(1) -> Boolean (MySqlTypeUtils.java:108-109)
  - DECIMAL keeps (p,s) while p<=38, else String (variable-scale decimals
    also -> String, matching the VariableScaleDecimal handling in
    RowDataDebeziumDeserializeSchema's createDecimalConverter)
  - TIME(p) -> Integer millis-of-day (Spark has no TIME; documented
    convention, convertToTime analog)
  - TIMESTAMP -> TimestampNTZ, timezone-aware (ZonedTimestamp) ->
    Timestamp (session TZ) (convertToTimestamp /
    convertToLocalTimeZoneTimestamp)
  - ENUM/JSON/spatial -> String (GeoJSON for spatial,
    MySqlDeserializationConverterFactory.java:80-108); SET ->
    array<string> (:118-139)
  - MongoDB BSON documents/arrays -> Struct/Array/Map recursively
    (MongoDBConnectorDeserializationSchema.java:220-265) — natively
    expressible in Spark, surfaced here as passthrough
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Declaration shape: WORDS [ (args) ] [ WORDS ] — e.g. "INT UNSIGNED",
# "TIMESTAMP(6) WITH LOCAL TIME ZONE", "DECIMAL(10,2) UNSIGNED ZEROFILL",
# "FLOAT4", "SYS.XMLTYPE". Parsed imperatively (a single regex with lazy
# groups mis-splits multi-word bases).
_DECL_RE = re.compile(
    r"^\s*(?P<head>[a-zA-Z_.][a-zA-Z_. 0-9]*?)\s*"
    r"(?:\((?P<args>[^)]*)\)\s*(?P<tail>[a-zA-Z_ ]*))?\s*$",
    re.IGNORECASE,
)



# Declarations whose meaning differs by source database — transcribed from
# each connector doc's Data Type Mapping table (the per-dialect analog of
# MySqlTypeUtils/OracleTypeUtils/... fromDbzColumn). Checked row-by-row by
# tests/test_types_and_config.py::test_*_doc_type_table_mapping.
def _dialect_type(base, args, n, dialect):
    d = dialect  # already normalized by map_source_type
    # --- MongoDB: BSON type names, a disjoint namespace (mongodb-cdc.md) --
    if d in ("mongo", "mongodb"):
        bson = {
            "int": T.IntegerType(),       # Int -> INT (mongodb-cdc.md:460-462)
            "long": T.LongType(),
            "double": T.DoubleType(),
            "decimal128": T.DecimalType(38, 18),
            "boolean": T.BooleanType(),
            "date": T.TimestampType(),     # TIMESTAMP_LTZ(3)
            "timestamp": T.TimestampType(),
            "string": T.StringType(),
            "objectid": T.StringType(),
            "uuid": T.StringType(),
            "symbol": T.StringType(),
            "md5": T.StringType(),
            "javascript": T.StringType(),
            "regex": T.StringType(),
            "bindata": T.BinaryType(),
        }
        if base in bson:
            return bson[base]
    # --- Oracle: NUMBER precision tiers, DATE carries time (oracle-cdc.md)
    if d == "oracle":
        if base == "number":
            p = n
            sc = int(args[1]) if len(args) > 1 and args[1].lstrip("-").isdigit() else 0
            if p is not None and sc <= 0:
                span = p - sc
                if p == 1:
                    return T.BooleanType()   # NUMBER(1) -> BOOLEAN
                if span < 3:
                    return T.ByteType()
                if span < 5:
                    return T.ShortType()
                if span < 10:
                    return T.IntegerType()
                if span < 19:
                    return T.LongType()
                if span <= 38:
                    return T.DecimalType(span, 0)
                return T.StringType()
            if p is not None and sc > 0:
                return T.DecimalType(p, sc) if p <= 38 else T.StringType()
            return T.DecimalType(38, 18)     # unconstrained NUMBER
        if base == "date":
            return T.TimestampNTZType()      # Oracle DATE has a time part
        if base in ("binary_float",):
            return T.FloatType()
        if base in ("binary_double",):
            return T.DoubleType()
        if base in ("nchar", "nvarchar2", "varchar2", "nclob", "xmltype", "sys.xmltype"):
            return T.StringType()
        if base == "rowid":
            return T.BinaryType()
        if base in ("interval day to second", "interval year to month"):
            return T.LongType()
        if base.startswith("timestamp") and "time zone" in base:
            return T.TimestampType()      # WITH [LOCAL] TIME ZONE
    # --- SQL Server (sqlserver-cdc.md) --------------------------------
    if d == "sqlserver":
        if base == "tinyint":
            return T.ShortType()             # T-SQL tinyint is 0..255
        if base in ("float", "real"):
            return T.DoubleType()            # doc maps both to DOUBLE
        if base == "bit":
            return T.BooleanType()
        if base == "money":
            return T.DecimalType(19, 4)
        if base == "smallmoney":
            return T.DecimalType(10, 4)
        if base in ("nvarchar", "nchar", "ntext", "xml"):
            return T.StringType()
        if base in ("datetime", "datetime2", "smalldatetime"):
            return T.TimestampNTZType()
        if base == "datetimeoffset":
            return T.TimestampType()
    # --- Postgres (postgres-cdc.md) -----------------------------------
    if d in ("postgres", "postgresql"):
        if base in ("real", "float4"):
            return T.FloatType()
        if base == "float8":
            return T.DoubleType()
        if base in ("int2", "smallserial", "serial2"):
            return T.ShortType()
        if base == "serial":
            return T.IntegerType()
        if base == "bigserial":
            return T.LongType()
        if base in ("character", "character varying"):
            return T.StringType()
    # --- Db2 (db2-cdc.md) ---------------------------------------------
    if d == "db2":
        if base == "real":
            return T.FloatType()
        if base in ("clob", "dbclob"):
            return T.BinaryType()            # doc maps CLOB/DBCLOB -> BYTES
        if base in ("vargraphic", "xml"):
            return T.StringType()
    # --- TiDB / OceanBase: TIMESTAMP is LTZ (tidb/oceanbase-cdc.md) ----
    if d in ("tidb", "oceanbase"):
        if base == "timestamp":
            return T.TimestampType()
        if base == "real":
            # tidb follows MySQL (REAL=DOUBLE); oceanbase's table says FLOAT
            return T.DoubleType() if d == "tidb" else T.FloatType()
    return None


def map_source_type(decl: str, dialect: str = "mysql") -> T.DataType:
    """Source DDL type declaration -> Spark DataType (the discovery-time
    mapping, MySqlTypeUtils.fromDbzColumn analog).

    ``dialect`` resolves the declarations whose meaning differs by
    database: MySQL REAL is DOUBLE (mysql-cdc.md type table) while
    Postgres REAL/FLOAT4 is FLOAT (postgres-cdc.md:355-359)."""
    m = _DECL_RE.match(decl)
    if not m:
        raise ValueError(f"unparseable type declaration: {decl!r}")
    args = [a.strip() for a in (m.group("args") or "").split(",") if a.strip()]
    # words before the parens + words after them form the full name;
    # UNSIGNED/ZEROFILL modifiers are stripped off wherever they appear
    words = (m.group("head").lower().split()) + (
        (m.group("tail") or "").lower().split()
    )
    unsigned = "unsigned" in words
    words = [w for w in words if w not in ("unsigned", "zerofill")]
    base = " ".join(words)
    n = int(args[0]) if args and args[0].isdigit() else None

    dialect_n = dialect.lower().removesuffix("-cdc")
    resolved = _dialect_type(base, args, n, dialect_n)
    if resolved is not None:
        return resolved

    if base in ("bit", "tinyint") and n == 1:
        return T.BooleanType()
    if base == "bit":
        # BIT(n>1) -> BINARY(ceil(n/8)) per mysql-cdc.md's type table
        return T.BinaryType()
    if base == "boolean":
        return T.BooleanType()
    if base == "tinyint":
        return T.ShortType() if unsigned else T.ByteType()
    if base == "smallint":
        return T.IntegerType() if unsigned else T.ShortType()
    if base in ("int", "integer", "mediumint"):
        return T.LongType() if unsigned else T.IntegerType()
    if base == "serial":
        # SERIAL is an alias for BIGINT UNSIGNED -> DECIMAL(20, 0)
        return T.DecimalType(20, 0)
    if base == "bigint":
        return T.DecimalType(20, 0) if unsigned else T.LongType()
    if base in ("decimal", "numeric", "fixed"):
        p = n or 10
        s = int(args[1]) if len(args) > 1 else 0
        return T.DecimalType(p, s) if p <= 38 else T.StringType()
    if base == "real":
        # MySQL rules are the default for unknown dialects (TableDef.dialect
        # contract); only the dialects whose docs say FLOAT got it above
        return T.DoubleType()
    if base in ("float", "float4"):
        return T.FloatType()
    if base in ("double", "double precision", "float8"):
        return T.DoubleType()
    # "string" is the Flink SQL spelling (the reference's DDLs declare
    # STRING columns, README.md:27-56) — same lattice point as varchar
    if base in ("char", "varchar", "string", "text", "tinytext", "mediumtext",
                "longtext", "enum", "json", "clob"):
        return T.StringType()
    if base == "set":
        return T.ArrayType(T.StringType())
    if base in ("binary", "varbinary", "blob", "tinyblob", "mediumblob", "longblob", "bytea"):
        return T.BinaryType()
    if base == "date":
        return T.DateType()
    if base in ("time", "time without timezone", "time without time zone"):
        return T.IntegerType()  # millis-of-day convention (no TIME in Spark)
    if base in ("datetime", "timestamp", "timestamp without timezone",
                "timestamp without time zone"):
        return T.TimestampNTZType()
    if base in ("timestamp with time zone", "timestamptz", "timestamp_ltz"):
        return T.TimestampType()
    if base in ("geometry", "point", "linestring", "polygon", "multipoint",
                "multilinestring", "multipolygon", "geometrycollection"):
        return T.StringType()  # GeoJSON convention
    if base == "year":
        return T.IntegerType()
    raise ValueError(f"unsupported source type: {decl!r}")


def table_schema(columns: list[tuple[str, str]]) -> T.StructType:
    """[(name, source decl)] -> StructType (discoverDataCollectionSchemas
    analog, DataSourceDialect.java:44-52)."""
    return T.StructType(
        [T.StructField(name, map_source_type(decl), nullable=True) for name, decl in columns]
    )


# --- defensive value converters (RowDataDebeziumDeserializeSchema:244-657) --
#
# Debezium ships values in several runtime shapes per logical type; the
# reference's converters accept them all. Spark-side the same tolerance is a
# cast chain applied when decoding the envelope.


def to_boolean(c: Column) -> Column:
    """Boolean from Boolean/number/'1'/'true' (convertToBoolean analog)."""
    s = F.lower(c.cast("string"))
    return F.when(s.isin("true", "1"), F.lit(True)).when(
        s.isin("false", "0"), F.lit(False)
    ).otherwise(c.cast("boolean"))


def to_time_millis(c: Column) -> Column:
    """TIME(p) -> millis-of-day int. Debezium sends micros (MicroTime) or
    nanos (NanoTime) as longs; detect scale by magnitude (a day has
    86.4e6 ms / 86.4e9 us / 86.4e12 ns) — convertToTime analog."""
    v = c.cast("long")
    return (
        F.when(v >= 86_400_000_000, (v / 1_000_000))  # nanos
        .when(v >= 86_400_000, (v / 1_000))  # micros
        .otherwise(v)
        .cast("int")
    )


def to_timestamp_from_epoch(c: Column) -> Column:
    """Debezium Timestamp/MicroTimestamp/NanoTimestamp long -> timestamp,
    scale detected by magnitude (convertToTimestamp analog)."""
    v = c.cast("long")
    micros = (
        F.when(F.abs(v) >= 100_000_000_000_000_000, (v / 1000).cast("long"))  # nanos
        .when(F.abs(v) >= 100_000_000_000_000, v)  # micros
        .otherwise(v * 1000)  # millis
    )
    return F.timestamp_micros(micros.cast("long"))


def to_decimal_string(c: Column, precision: int = 38, scale: int = 18) -> Column:
    """Variable-scale decimal -> exact string (VariableScaleDecimal analog:
    when scale isn't fixed, the reference falls back to STRING)."""
    return c.cast(T.DecimalType(precision, scale)).cast("string")


def set_to_array(c: Column) -> Column:
    """MySQL SET 'a,b,c' -> array<string> (MySqlDeserializationConverterFactory:118-139)."""
    return F.when(c.isNull(), F.lit(None).cast("array<string>")).otherwise(
        F.split(c.cast("string"), ",")
    )
