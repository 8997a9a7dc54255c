"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (changelog-normalize the events
binlog, aggregate the materialized state — the reference's flagship ITCase
shape, MySqlConnectorITCase.java:215-241) at sf0.001.

``queries()`` / ``oracle_sql()`` expose one entry per implemented
SURVEY.md §2 query key from the engine's registry
(``flink_cdc_connectors_spark.registry``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_cdc_connectors_spark.operators.cdc import changelog_normalize
from flink_cdc_connectors_spark.registry import all_queries
from flink_cdc_connectors_spark.sources.envelope import changelog_view
from flink_cdc_connectors_spark.sources.loaders import load_table

FLAGSHIP_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: materialize latest state per key from the changelog, then
    aggregate it (normalize-then-aggregate — retract-correct by
    construction)."""
    events = load_table(spark, FLAGSHIP_SF_DIR, "events")
    state = changelog_normalize(changelog_view(events))
    return (
        state.groupBy((F.col("user_id") % 10).alias("cohort"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .orderBy("cohort")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Insertion order is deliberate (registry._CHECK_FIRST): the driver's
    # bounded CORRECTNESS budget compares roughly the first 50 keys in
    # emission order, so each round front-loads the keys with the weakest
    # or oldest driver evidence (rotation policy documented at the
    # _CHECK_FIRST definition).  Do not sort here.
    return {key: spec.builder for key, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        key: spec.oracle
        for key, spec in all_queries().items()
        if spec.oracle is not None
    }


def oracle_gates() -> dict[str, int]:
    """Corpus-size validity gates for the value oracles (ADVICE r10).

    For each listed key, the SQL in ``oracle_sql()`` replays the builder's
    sub-gate hash family and is valid ONLY while ``count(documents)`` at
    the compared fixture is <= the returned threshold; above it the
    builder switches families (word-tuple xxhash64) and a value comparison
    would report a false mismatch.  Every driver fixture (sf0.001-0.1) is
    far below every gate, so this is informational for the standard
    CORRECTNESS run and binding only for synthetic scale fixtures.  Keys
    not listed have scale-independent oracles."""
    return {
        key: spec.oracle_max_docs
        for key, spec in all_queries().items()
        if spec.oracle_max_docs is not None
    }


def oracle_embedding_gates() -> dict[str, int]:
    """Same contract as :func:`oracle_gates`, over ``count(embeddings)``
    (VERDICT r11 #4): the vector keys whose LSH-parameter formulas widen
    past a corpus point have static oracles valid only while the compared
    fixture's ``embeddings`` table is <= the returned threshold."""
    return {
        key: spec.oracle_max_embeddings
        for key, spec in all_queries().items()
        if spec.oracle_max_embeddings is not None
    }
