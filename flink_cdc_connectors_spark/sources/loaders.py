"""Typed loaders for the synthetic fixture tables.

Plain ``spark.read.parquet`` — schemas travel with the files, Catalyst gets
full pushdown (PushedFilters / ReadSchema pruning) because nothing wraps the
scan. At 100 TB the same call works against a partitioned table directory;
nothing here assumes single-file inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_cdc_connectors_spark import TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Parquet columns that MAY be written as TIMESTAMP(NANOS) — Spark has no
# nanosecond timestamp, so those files are read as long
# (spark.sql.legacy.parquet.nanosAsLong) and truncated to microseconds,
# matching DuckDB's ns->us cast semantics. Fixture generations vary: some
# write TIMESTAMP(MICROS), which Spark reads natively as TIMESTAMP_NTZ —
# the dtype check below handles both without a second file-footer read.
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table (``region nation customer supplier part orders
    lineitem events documents embeddings``)."""
    nanos_cols = _NANOS_TS_COLS.get(name, ())
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for c in nanos_cols:
        if dtypes.get(c) == "bigint":  # nanos-as-long file: truncate to us
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dtypes.get(c) == "timestamp_ntz":
            # TIMESTAMP(MICROS) parquet surfaces as TIMESTAMP_NTZ; cast to
            # the session-zoned TIMESTAMP every query (and the round-1
            # plans) were built against. The box and DuckDB both run UTC,
            # so wall-clock values are unchanged.
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's parallelism.

    The fixture parquet files are written as a SINGLE row group, so Spark's
    byte-range file splitting cannot parallelize the scan — every query
    would run its pre-shuffle stages on one core. A real 100 TB table has
    thousands of row groups and never needs this; here one cheap shuffle of
    the (small) input buys full parallelism for CPU-heavy downstream work
    (shingling, hashing, vector math). Apply ONLY where the pre-shuffle
    stage dominates — it is a no-op cost at fixture sizes but an
    anti-pattern to sprinkle blindly at scale."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register fixture tables as temp views so queries can use spark.sql."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)
