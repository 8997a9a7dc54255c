#!/usr/bin/env python
"""A/B: the round-11 exploding-join form of join_lookup vs the shipped
union-as-of form, at sf0.1 and the sf1 events fixture (10x keys).
Old form reconstructed verbatim from git history (hours JOIN dim ON
user_id + ts < hour_start, rank-1 window)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flink_cdc_connectors_spark.registry import all_queries
from flink_cdc_connectors_spark.session import get_spark
from flink_cdc_connectors_spark.sources.loaders import load_table


def old_join_lookup(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    ev = e.select(
        "event_id", "user_id", "ts", F.date_trunc("hour", "ts").alias("hour_start")
    )
    dim = e.select(
        "user_id", F.col("ts").alias("d_ts"), F.col("event_id").alias("d_eid"), "value"
    )
    hours = ev.select("user_id", "hour_start").distinct()
    w = W.partitionBy("user_id", "hour_start").orderBy(
        F.col("d_ts").desc(), F.col("d_eid").desc()
    )
    cache = (
        hours.join(dim, "user_id")
        .filter(F.col("d_ts") < F.col("hour_start"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "hour_start",
            F.round(F.col("value"), 2).alias("stale_value_r"),
        )
    )
    return ev.join(cache, ["user_id", "hour_start"], "left").select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "stale_value_r",
    )


def t(spark, builder, sf_dir, n=2):
    runs = []
    for _ in range(n + 1):  # first is warm
        t0 = time.monotonic()
        builder(spark, sf_dir).write.mode("overwrite").format("noop").save()
        runs.append(time.monotonic() - t0)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    return min(runs[1:])


def main():
    spark = get_spark(app_name="join_lookup_ab")
    new = all_queries()["join_lookup"].builder
    sf01 = "/root/testdata/sf0.1"
    sf1 = "/tmp/spark_graft_sf1"
    for name, b in [("old-exploding", old_join_lookup), ("new-union-asof", new)]:
        r01 = t(spark, b, sf01)
        r1 = t(spark, b, sf1)
        print(
            f"{name}: sf0.1={r01:.2f}s sf1={r1:.2f}s ratio={r1 / r01:.1f}x "
            f"load={os.getloadavg()[0]:.1f}",
            flush=True,
        )
    spark.stop()



def build_depth_fixture(spark, src, dst, reps=10):
    """Same keys, reps x the per-key history (event_id/ts shifted per
    replica) — the growth mode where the old form's (hours x depth)
    per-key pairing goes superlinear while union-as-of stays linear."""
    ev = load_table(spark, src, "events")
    mx = ev.agg(F.max("event_id"), (F.max("ts").cast("long") - F.min("ts").cast("long"))).first()
    emax, span_s = mx[0] + 1, mx[1] + 1
    reps_dfs = [
        ev.select(
            (F.col("event_id") + k * emax).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {k * span_s} SECOND")).alias("ts"),
            "user_id", "event_type", "value", "props",
        )
        for k in range(reps)
    ]
    out = reps_dfs[0]
    for r in reps_dfs[1:]:
        out = out.unionByName(r)
    out.repartition(32).write.mode("overwrite").parquet(f"{dst}/events.parquet")


def depth_main():
    spark = get_spark(app_name="join_lookup_depth")
    dst = "/tmp/spark_graft_depth10"
    if not os.path.isdir(f"{dst}/events.parquet"):
        build_depth_fixture(spark, "/root/testdata/sf0.1", dst)
    new = all_queries()["join_lookup"].builder
    for name, b in [("old-exploding", old_join_lookup), ("new-union-asof", new)]:
        r01 = t(spark, b, "/root/testdata/sf0.1")
        rd = t(spark, b, dst)
        print(f"{name}: sf0.1={r01:.2f}s depth10={rd:.2f}s ratio={rd / r01:.1f}x "
              f"load={os.getloadavg()[0]:.1f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    depth_main() if "--depth" in sys.argv else main()
