"""Scale toolkit: bucketing for co-located joins, salting for skew.

The two knobs SURVEY §4 reserves for 100 TB operation beyond what AQE does
automatically:

- **Bucketing**: persist both sides of a recurring join bucketed on the
  join key -> the sort-merge join reads pre-shuffled data and the Exchange
  disappears from the plan entirely (verified by plan-audit test). The
  reference's analog is chunk-aligned parallel reads; on Spark the storage
  layout carries the partitioning.
- **Salting**: a hot group key overwhelms one reducer. Two-stage
  aggregation — partial by (key, salt), final by key — spreads the hot key
  over ``salt_buckets`` reducers. AQE's skewJoin handles skewed JOINs at
  runtime; salting is for skewed AGGREGATIONS, which AQE does not split.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


# Bucketed tables live in an explicit scratch root, NOT the session's
# warehouse dir: the default warehouse is cwd-relative, and a caller (the
# bench driver) may run from a directory it must not write to.
_BUCKETED_ROOT = os.environ.get("SPARK_GRAFT_BUCKETED_DIR", "/tmp/spark_graft_bucketed")


def write_bucketed(
    df: DataFrame, table: str, key: str, num_buckets: int = 8
) -> None:
    """Persist ``df`` bucketed+sorted on ``key`` (hash-partitioned storage
    layout — every future equi-join/agg on ``key`` reads it pre-shuffled).

    Idempotent across sessions: the in-memory catalog forgets tables when
    the session ends but their directories survive, and a later CREATE
    fails with LOCATION_ALREADY_EXISTS — drop the catalog entry AND clear
    the stale location first. The table is external at a pinned scratch
    path (see ``_BUCKETED_ROOT``)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    path = os.path.join(_BUCKETED_ROOT, table.lower())
    shutil.rmtree(path, ignore_errors=True)
    # stale MANAGED location from an older layout blocks CREATE too
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    if wh:
        shutil.rmtree(os.path.join(wh, table.lower()), ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, key)
        .sortBy(key)
        .format("parquet")
        .option("path", path)
        .saveAsTable(table)
    )


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two tables bucketed on the same key with the same bucket count:
    Catalyst sees the matching output partitioning and plans a sort-merge
    join with NO Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), key)


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    agg_exprs: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe two-stage aggregation.

    ``agg_exprs``: {column: fn} with fn in {'sum', 'count', 'min', 'max'}
    — the decomposable aggregates (partial results combine associatively;
    avg callers decompose into sum+count themselves).

    Stage 1 groups by (keys..., salt) — the hot key's rows spread across
    ``salt_buckets`` reducers; stage 2 combines the small partials by the
    real keys. Identical results to a direct groupBy, bounded per-reducer
    load.
    """
    combine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for fn in agg_exprs.values():
        if fn not in combine:
            raise ValueError(f"non-decomposable aggregate: {fn}")
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("__salt")
    partial = df.withColumn("__salt", salt).groupBy(*key_cols, "__salt").agg(
        *[
            (F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(c)).alias(f"__p_{c}_{fn}")
            for c, fn in agg_exprs.items()
        ]
    )
    return partial.groupBy(*key_cols).agg(
        *[
            combine[fn](f"__p_{c}_{fn}").alias(f"{fn}_{c}")
            for c, fn in agg_exprs.items()
        ]
    )
