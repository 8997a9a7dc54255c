"""SQL-first facade — the `CREATE TABLE ... WITH ('connector'='mysql-cdc')`
experience on Spark temp views.

The reference's primary UX is SQL (README.md:27-56: declare a CDC table,
then plain `SELECT`/`GROUP BY` over it). Spark-side the same shape is:
register the changelog and its derived views once, then `spark.sql(...)`
anything over them — Catalyst plans it all.

    register_cdc_views(spark, sf_dir)
    spark.sql("SELECT cohort, sum(value) FROM events_latest_state ...")
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from flink_cdc_connectors_spark.operators.cdc import (
    changelog_normalize,
    to_retract_stream,
)
from flink_cdc_connectors_spark.sources.envelope import changelog_view
from flink_cdc_connectors_spark.sources.loaders import load_table, register_views


def register_cdc_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the fixture tables plus the engine's changelog views:

    - ``events_changelog``: op-tagged offset-ordered change stream
      (the CDC table a user would declare with DDL in the reference)
    - ``events_latest_state``: materialized latest state per key
      (ChangelogNormalize output — what an upsert sink holds)
    - ``events_retract``: RowKind-tagged retract stream
      (ChangelogMode.all)
    """
    register_views(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    cl = changelog_view(events)
    cl.createOrReplaceTempView("events_changelog")
    changelog_normalize(cl).createOrReplaceTempView("events_latest_state")
    to_retract_stream(cl).createOrReplaceTempView("events_retract")
