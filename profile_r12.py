#!/usr/bin/env python
"""Round-12 optimization profiler.

Three subcommands, all reusing the bench protocol pieces so numbers are
comparable with bench.py / bench_quiet.py:

  plans [keys...]   — write .explain('formatted') for each key (default:
                      all) to plans/r12/<key>_<tag>.txt.  Explain-only:
                      builders run their driver-side prep (which for
                      streaming keys includes the drain), so streaming
                      keys are skipped unless named explicitly.
  time <keys...>    — warm + N timed runs per key through the noop sink
                      (bench.run_one), print per-run seconds + job count.
  stages <key>      — run the key once and dump per-job wall times using
                      job-group tagging (coarse driver-side phase split).

Usage: python profile_r12.py plans|time|stages [args]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import run_one, warm_session  # noqa: E402
from flink_cdc_connectors_spark.plans.audit import explain_str  # noqa: E402
from flink_cdc_connectors_spark.registry import all_queries  # noqa: E402
from flink_cdc_connectors_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r12")

# Keys whose BUILDER already drives jobs/streams eagerly: explain() on the
# returned frame is still valid, but producing it costs a full drain — only
# do these when asked by name.
_EAGER_HEAVY = {
    "cdc_stream_dedup_index",
    "cdc_dsv2_added_tables",
    "cdc_dsv2_stream",
    "stream_e2e_windowed",
    "cdc_mongo_changestream",
}


def cmd_plans(args: list[str]) -> None:
    tag = "before"
    if args and args[0].startswith("--tag="):
        tag = args[0].split("=", 1)[1]
        args = args[1:]
    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = get_spark(app_name="profile_r12_plans")
    queries = all_queries()
    keys = args or [k for k in sorted(queries) if k not in _EAGER_HEAVY]
    for key in keys:
        t0 = time.monotonic()
        try:
            df = queries[key].builder(spark, SF_DIR)
            plan = explain_str(df, "formatted")
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR: {type(exc).__name__}: {exc}"
        path = os.path.join(PLANS_DIR, f"{key}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{key}: {time.monotonic() - t0:.2f}s -> {path}", flush=True)
    spark.stop()


def _wait_quiet(gate: float = 1.5, timeout_s: float = 600.0) -> float:
    """Block until the 1-min load drops under ``gate`` (neighbor bursts on
    this box hit ~10-15 for a couple of minutes every ~10 min and inflate
    single readings 1.5-3x — the same gating bench_quiet.py uses)."""
    t0 = time.monotonic()
    load = os.getloadavg()[0]
    while load > gate and time.monotonic() - t0 < timeout_s:
        time.sleep(10)
        load = os.getloadavg()[0]
    return load


def cmd_time(args: list[str]) -> None:
    n = 2
    gate = None
    while args and args[0].startswith("--"):
        if args[0].startswith("--n="):
            n = int(args[0].split("=", 1)[1])
        elif args[0].startswith("--gate="):
            gate = float(args[0].split("=", 1)[1])
        args = args[1:]
    spark = get_spark(app_name="profile_r12_time")
    queries = all_queries()
    warm_session(spark, queries, SF_DIR)
    for key in args:
        try:
            if gate is not None:
                load = _wait_quiet(gate)
                if load > gate:
                    print(f"WARN {key}: load {load} still above gate", flush=True)
            run_one(spark, queries[key].builder, SF_DIR)  # warm
            runs = [run_one(spark, queries[key].builder, SF_DIR) for _ in range(n)]
            print(
                f"{key}: min={min(runs):.3f} load={os.getloadavg()[0]:.1f} runs="
                + ",".join(f"{r:.3f}" for r in runs),
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001
            print(f"{key}: FAIL {type(exc).__name__}: {exc}", flush=True)
    spark.stop()


def cmd_stages(args: list[str]) -> None:
    """One warmed run with per-Spark-job timing via the status tracker."""
    key = args[0]
    spark = get_spark(app_name="profile_r12_stages")
    queries = all_queries()
    warm_session(spark, queries, SF_DIR)
    run_one(spark, queries[key].builder, SF_DIR)  # warm
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before_ids = set(tracker.getJobIdsForGroup(None) or [])
    t0 = time.monotonic()
    elapsed = run_one(spark, queries[key].builder, SF_DIR)
    print(f"{key}: total {elapsed:.3f}s")
    jjt = sc._jsc.sc().statusTracker()
    ids = sorted(set(jjt.getJobIdsForGroup(None)) - before_ids)
    for jid in ids:
        info = jjt.getJobInfo(jid)
        if info.isEmpty():
            continue
        ji = info.get()
        sids = list(ji.stageIds())
        tot_ms = 0
        names = []
        for sid in sids:
            si = jjt.getStageInfo(sid)
            if si.isEmpty():
                continue
        print(f"  job {jid}: stages={sids}")
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time"
    fn = {"plans": cmd_plans, "time": cmd_time, "stages": cmd_stages}[cmd]
    fn(sys.argv[2:])
