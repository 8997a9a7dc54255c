"""Parse Spark physical plans for scale assertions.

These run in tests (tests/test_plan_audits.py) so a regression that, say,
drops a filter pushdown or turns a broadcast join into a shuffle join fails
CI — plan shape is part of the engine's contract, because at 100 TB the
plan IS the performance.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_pushed_filters(df: DataFrame, *needles: str) -> bool:
    """True if the scan node reports PushedFilters containing all needles."""
    plan = explain_str(df)
    m = re.findall(r"PushedFilters: \[(.*)\]", plan)
    joined = ";".join(m)
    return bool(m) and all(n in joined for n in needles)

def read_schema_columns(df: DataFrame) -> set[str]:
    """Columns the parquet scan actually reads (ReadSchema) — column
    pruning verification."""
    plan = explain_str(df)
    cols: set[str] = set()
    for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        for field in m.split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    plan = explain_str(df, "simple")
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def shuffle_count(df: DataFrame) -> int:
    """Number of exchange (shuffle) operators in the physical plan."""
    plan = explain_str(df, "simple")
    return len(re.findall(r"Exchange (?:hash|range)partitioning", plan))


def has_single_partition_exchange(df: DataFrame) -> bool:
    """Detect any all-data-to-one-partition exchange — the anti-pattern a
    global-ORDER-BY window or un-keyed ranking introduces. Legitimate only
    for final top-k/global-agg of already-tiny data."""
    plan = explain_str(df, "simple")
    return "Exchange SinglePartition" in plan


def has_single_partition_window(df: DataFrame) -> bool:
    """Detect the specific scale-killer WindowExec warns about ('No
    Partition Defined for Window operation'): a Window whose input is an
    ``Exchange SinglePartition`` — ALL rows sorted through one task. A
    plan may legitimately contain SinglePartition exchanges for one-row
    global aggregates (min/max, count); those are not windows and pass."""
    plan = explain_str(df, "simple")
    # Window plans as Window -> Sort -> Exchange; match the chain with any
    # tree-drawing prefix on the intermediate lines.
    return bool(
        re.search(
            r"Window [^\n]*\n[^\n]*?Sort [^\n]*\n[^\n]*?Exchange SinglePartition",
            plan,
        )
    )


def wholestage_codegen_count(df: DataFrame) -> int:
    plan = explain_str(df, "simple")
    return len(set(re.findall(r"\*\((\d+)\)", plan)))
