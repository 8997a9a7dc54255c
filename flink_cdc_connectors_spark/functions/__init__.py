"""Engine function library — reusable Column-level building blocks.

``text``: normalization, shingling, MinHash signatures, SimHash, token
counting, language-ID heuristics, quality scoring, rolling fingerprints.
``vectors``: dot/cosine/norm and sign-LSH bucketing over array<float>.

Everything is built from JVM-side ``pyspark.sql.functions`` (whole-stage
codegen, no Python in the hot path); the multimodal decode stubs are the
only Pandas-UDF surface and live with their queries.
"""

from flink_cdc_connectors_spark.functions import text, vectors  # noqa: F401
