"""Registered query keys (SURVEY.md §2). Importing the tier modules fills
the registry; use ``flink_cdc_connectors_spark.registry.all_queries()``."""
