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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
    salt_col: str = "__salt",
    salt_from: "F.Column | None" = None,
) -> DataFrame:
    """Skew-safe equi-join by key salting: the fact side adds a
    deterministic salt, the dim side REPLICATES each row ``salt_buckets``
    times (one per salt value), and the join runs on (key, salt) — a hot
    fact key's rows spread across ``salt_buckets`` reducers instead of
    landing on one.

    AQE's runtime skew-join split covers skewed batch SMJs; the manual
    salt is for the cases AQE cannot split — stream-stream joins, stateful
    operators keyed on the join key, or any engine/stage where the join
    partitioning is also the state partitioning. Cost: dim side grows
    ``salt_buckets``x (fine for dimension tables; never salt two large
    sides — pick the bigger side's hot keys and salt only those).

    Identical results to ``fact.join(dim, key)`` for inner joins.
    """
    # salt from a stable row attribute when given (deterministic across
    # repartitions/retries — what a restartable stage needs); else from
    # the physical row id (fine for one-shot batch)
    src = salt_from if salt_from is not None else F.xxhash64(F.monotonically_increasing_id())
    salted_fact = fact.withColumn(
        salt_col, F.abs(src % salt_buckets).cast("int")
    )
    replicas = dim.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_fact.join(replicas, [key, salt_col]).drop(salt_col)
