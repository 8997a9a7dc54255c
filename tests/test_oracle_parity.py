"""Every registered query vs its DuckDB oracle at sf0.001.

This mirrors the driver's CORRECTNESS gate (row count + columns + values,
order-insensitive). Keys without an oracle get a weaker runs-and-has-schema
check — the same downgrade the driver applies.
"""

from __future__ import annotations

import pytest

from flink_cdc_connectors_spark.registry import all_queries, oracle_valid_at
from tests.oracle_compare import assert_same

QUERIES = all_queries()


def _n_docs(duck) -> int:
    return duck.execute("SELECT count(*) FROM documents").fetchone()[0]


def _n_embeddings(duck) -> int:
    return duck.execute("SELECT count(*) FROM embeddings").fetchone()[0]


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_query_vs_oracle(key, spark, duck, sf_dir):
    spec = QUERIES[key]
    sdf = spec.builder(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    assert list(spark_pdf.columns), f"{key}: no columns"
    # Anti-vacuity gate: a 0=0 oracle match proves nothing (round-1 shipped
    # four such passes). Every query must compare at least one real row.
    assert len(spark_pdf) > 0, f"{key}: vacuous result (0 rows) at {sf_dir}"
    if spec.oracle is None:
        # rows-only check: deterministic across two runs
        again = spec.builder(spark, sf_dir).toPandas()
        assert len(spark_pdf) == len(again), f"{key}: nondeterministic row count"
        return
    if not oracle_valid_at(spec, _n_docs(duck), _n_embeddings(duck)):
        # Corpus-gated oracle (ADVICE r10 / VERDICT r11 #4): above
        # spec.oracle_max_docs (or .oracle_max_embeddings) the builder
        # runs a different hash family / parameter formula than the
        # oracle replays — a value comparison there is a FALSE mismatch,
        # not evidence.  Unreachable at the test fixtures (50-5000 docs
        # vs 24k gates); kept as the explicit skip so a scale-fixture run
        # flags instead of failing.
        pytest.skip(
            f"{key}: oracle gated to <= {spec.oracle_max_docs} docs / "
            f"<= {spec.oracle_max_embeddings} embeddings"
        )
    duck_pdf = duck.execute(spec.oracle).fetchdf()
    assert_same(spark_pdf, duck_pdf, key)
