"""Run every registered query with an oracle against DuckDB at sf0.001.

This mirrors the driver's correctness gate (which runs at sf0.01): same
table views, row-count + schema + order-insensitive value comparison.
Queries without an oracle get a smoke check (runs, returns >= 0 rows,
stable schema).
"""

from __future__ import annotations

import pytest

from ghcn_d_etl_project_spark.plans import all_queries
from tests.conftest import SF_DIR
from tests.oracle_check import run_parity

QUERIES = all_queries()

# Per-query float tolerance overrides (default: exact float match).
TOLERANCE: dict[str, float] = {}

WITH_ORACLE = sorted(n for n, q in QUERIES.items() if q.oracle)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if not q.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, duck, name):
    run_parity(spark, duck, QUERIES[name], SF_DIR, rel_tol=TOLERANCE.get(name))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_smoke(spark, name):
    df = QUERIES[name].fn(spark, SF_DIR)
    assert df.columns, f"{name}: no columns"
    assert df.count() >= 0
