"""Oracle non-vacuity at the DRIVER's scale factor.

The in-repo parity test runs at sf0.001; the driver compares at sf0.01.
A predicate that selects rows at the small fixture but ZERO at the
driver's can silently turn the driver row into a 0=0 vacuous pass
(round-3 catch: subquery_scalar's 2x-average threshold selected 2 rows
at sf0.001 and none at sf0.01). Running every ORACLE alone in DuckDB is
cheap and bounds the Spark side too — when the hash matches, both sides
have the oracle's row count."""

from __future__ import annotations

import duckdb
import pytest

from flink_cdc_connectors_spark import TABLES
from flink_cdc_connectors_spark.registry import all_queries

DRIVER_SF_DIR = "/root/testdata/sf0.01"

QUERIES = {k: s for k, s in all_queries().items() if s.oracle is not None}


@pytest.fixture(scope="module")
def duck01():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{DRIVER_SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_oracle_nonempty_at_driver_sf(key, duck01):
    n = duck01.execute(
        f"SELECT count(*) FROM ({QUERIES[key].oracle})"
    ).fetchone()[0]
    assert n > 0, f"{key}: oracle selects 0 rows at {DRIVER_SF_DIR} — vacuous driver pass"
