"""flink_cdc_connectors_spark — a PySpark-native CDC analytics engine.

A from-scratch engine with the query and data-processing capabilities of
shuyilink/flink-cdc-connectors (Flink CDC source connectors + the Flink SQL
surface they feed), re-expressed Spark-first:

- ``sources``    — typed loaders for the test fixtures, the Debezium-style
                   changelog envelope, and a custom Python streaming data
                   source that implements the chunked-snapshot / stream
                   two-phase protocol (DBLog, arXiv:2010.12597).
- ``operators``  — CDC-semantics operators (changelog normalize, chunk
                   split/reconcile, offset filtering, startup modes) and the
                   relational/streaming query surface, all built on the
                   DataFrame API so Catalyst plans physical execution.
- ``functions``  — scalar/text/vector helpers (JVM-side built-ins first,
                   Pandas UDFs only where unavoidable).
- ``streaming``  — Structured Streaming versions: watermarks, windows,
                   foreachBatch merge materialization.

The correctness contract is the query registry (``registry.py``): one entry
per SURVEY.md §2 query key, each paired with DuckDB oracle SQL.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (avoids importing pyspark at package import).

    Exposes the most-used entry points at the root:
    ``get_spark``, ``all_queries``, ``load_table``, ``register_cdc_views``,
    ``changelog_normalize``, ``register_cdc_binlog_source``.
    """
    lazy = {
        "get_spark": ("flink_cdc_connectors_spark.session", "get_spark"),
        "all_queries": ("flink_cdc_connectors_spark.registry", "all_queries"),
        "load_table": ("flink_cdc_connectors_spark.sources.loaders", "load_table"),
        "register_cdc_views": ("flink_cdc_connectors_spark.sql", "register_cdc_views"),
        "changelog_normalize": (
            "flink_cdc_connectors_spark.operators.cdc",
            "changelog_normalize",
        ),
        "register_cdc_binlog_source": (
            "flink_cdc_connectors_spark.sources.datasource",
            "register",
        ),
    }
    if name in lazy:
        import importlib

        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
