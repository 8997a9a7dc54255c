#!/usr/bin/env python
"""Round-13 optimization profiler (successor of profile_r12.py).

Subcommands, all reusing the bench protocol pieces so numbers are
comparable with bench.py / bench_quiet.py:

  plans [--tag=T] [keys...] — write .explain('formatted') for each key
                      (default: all non-streaming) to plans/r13/<key>_<T>.txt.
  time [--n=N] [--gate=G] <keys...> — warm + N timed runs per key through
                      the noop sink (bench.run_one), print per-run seconds.
  split [--n=N] <keys...> — per-key builder-vs-write split: builder(spark,
                      sf_dir) wall vs noop-sink write wall, warmed, min of N.
  pyprof <key>      — cProfile the BUILDER only (no write), print the top
                      cumulative entries + the py4j socket share.
  stages <key>      — run the key once (warmed) and list job -> stage IDs
                      from the status tracker (coarse job-count evidence;
                      the tracker exposes no per-stage wall times).

Usage: python profile_r13.py plans|time|split|pyprof|stages [args]
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
PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r13")

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
    spark = get_spark(app_name="profile_r13_plans")
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
    spark = get_spark(app_name="profile_r13_time")
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


def cmd_split(args: list[str]) -> None:
    """Builder wall vs write wall, warmed, min over N repeats of each."""
    n = 2
    while args and args[0].startswith("--"):
        if args[0].startswith("--n="):
            n = int(args[0].split("=", 1)[1])
        args = args[1:]
    spark = get_spark(app_name="profile_r13_split")
    queries = all_queries()
    warm_session(spark, queries, SF_DIR)
    for key in args:
        try:
            run_one(spark, queries[key].builder, SF_DIR)  # warm
            builds, writes = [], []
            for _ in range(n):
                t0 = time.monotonic()
                df = queries[key].builder(spark, SF_DIR)
                t1 = time.monotonic()
                df.write.mode("overwrite").format("noop").save()
                t2 = time.monotonic()
                spark.catalog.clearCache()
                spark._jvm.System.gc()  # noqa: SLF001
                builds.append(t1 - t0)
                writes.append(t2 - t1)
            print(
                f"{key}: build={min(builds):.3f} write={min(writes):.3f} "
                f"load={os.getloadavg()[0]:.1f} "
                "builds=" + ",".join(f"{b:.3f}" for b in builds)
                + " writes=" + ",".join(f"{w:.3f}" for w in writes),
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001
            print(f"{key}: FAIL {type(exc).__name__}: {exc}", flush=True)
    spark.stop()


def cmd_pyprof(args: list[str]) -> None:
    """cProfile the builder: where does driver-side construction time go?"""
    import cProfile
    import io
    import pstats

    key = args[0]
    spark = get_spark(app_name="profile_r13_pyprof")
    queries = all_queries()
    warm_session(spark, queries, SF_DIR)
    run_one(spark, queries[key].builder, SF_DIR)  # warm
    spark.catalog.clearCache()
    pr = cProfile.Profile()
    pr.enable()
    queries[key].builder(spark, SF_DIR)
    pr.disable()
    s = io.StringIO()
    st = pstats.Stats(pr, stream=s)
    st.sort_stats("cumulative").print_stats(25)
    print(s.getvalue())
    # py4j share: time blocked in the gateway socket
    tot = st.total_tt
    recv = sum(
        v[3]
        for k, v in st.stats.items()  # noqa: SLF001
        if "recv_into" in str(k) or "smart_decode" in str(k) or "send_command" in str(k)
    )
    print(f"builder total {tot:.3f}s; py4j send/recv cumulative ~{recv:.3f}s")
    spark.stop()


def cmd_stages(args: list[str]) -> None:
    """One warmed run; list the key's job -> stage IDs from the status
    tracker (job/stage COUNT evidence — the tracker exposes task counts,
    not per-stage wall times, so no timing aggregation is attempted)."""
    key = args[0]
    spark = get_spark(app_name="profile_r13_stages")
    queries = all_queries()
    warm_session(spark, queries, SF_DIR)
    run_one(spark, queries[key].builder, SF_DIR)  # warm
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before_ids = set(tracker.getJobIdsForGroup(None) or [])
    elapsed = run_one(spark, queries[key].builder, SF_DIR)
    print(f"{key}: total {elapsed:.3f}s")
    jjt = sc._jsc.sc().statusTracker()  # noqa: SLF001
    ids = sorted(set(jjt.getJobIdsForGroup(None)) - before_ids)
    for jid in ids:
        info = jjt.getJobInfo(jid)
        if info.isEmpty():
            continue
        print(f"  job {jid}: stages={list(info.get().stageIds())}")
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time"
    fn = {
        "plans": cmd_plans,
        "time": cmd_time,
        "split": cmd_split,
        "pyprof": cmd_pyprof,
        "stages": cmd_stages,
    }[cmd]
    fn(sys.argv[2:])
