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

_TYPE_RE = re.compile(
    r"^\s*(?P<base>[a-zA-Z_ ]+?[0-9]?)\s*(?:\((?P<args>[^)]*)\))?"
    r"\s*(?P<unsigned>unsigned)?\s*(?:zerofill)?\s*$",
    re.IGNORECASE,
)


def map_source_type(decl: str, dialect: str = "mysql") -> T.DataType:
    """Source DDL type declaration -> Spark DataType (the discovery-time
    mapping, MySqlTypeUtils.fromDbzColumn analog).

    ``dialect`` resolves the declarations whose meaning differs by
    database: MySQL REAL is DOUBLE (mysql-cdc.md type table) while
    Postgres REAL/FLOAT4 is FLOAT (postgres-cdc.md:355-359)."""
    m = _TYPE_RE.match(decl)
    if not m:
        raise ValueError(f"unparseable type declaration: {decl!r}")
    base = " ".join(m.group("base").lower().split())
    args = [a.strip() for a in (m.group("args") or "").split(",") if a.strip()]
    unsigned = bool(m.group("unsigned"))
    n = int(args[0]) if args and args[0].isdigit() else None

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
        return T.DoubleType() if dialect == "mysql" else T.FloatType()
    if base in ("float", "float4"):
        return T.FloatType()
    if base in ("double", "double precision", "float8"):
        return T.DoubleType()
    # "string" is the Flink SQL spelling (the reference's DDLs declare
    # STRING columns, README.md:27-56) — same lattice point as varchar
    if base in ("char", "varchar", "string", "text", "tinytext", "mediumtext",
                "longtext", "enum", "json"):
        return T.StringType()
    if base == "set":
        return T.ArrayType(T.StringType())
    if base in ("binary", "varbinary", "blob", "tinyblob", "mediumblob", "longblob", "bytea"):
        return T.BinaryType()
    if base == "date":
        return T.DateType()
    if base == "time":
        return T.IntegerType()  # millis-of-day convention (no TIME in Spark)
    if base in ("datetime", "timestamp"):
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
