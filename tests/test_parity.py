"""Oracle parity: every registered query with an oracle must match DuckDB.

This mirrors the driver's CORRECTNESS gate (row count + columns +
order-insensitive canonical values) at a small scale factor so failures
surface locally first. Set PARITY_SF_DIR=/root/testdata/sf0.01 to run at
the driver's scale.
"""

import pytest

from distribot_spark.queries import QUERIES
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare

ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    spec = QUERIES[name]
    sdf = spec.builder(spark, SF_ORACLE)
    opdf = duck.execute(spec.oracle).fetchdf()
    problems = compare(sdf, opdf)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, name):
    spec = QUERIES[name]
    sdf = spec.builder(spark, SF_ORACLE)
    assert sdf.count() >= 0
