"""Every registered query with an oracle must match DuckDB on the
same tables — a local mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from eye_of_sauron_spark import plans
from tests._oracle import compare, duckdb_con

ORACLES = plans.all_oracles()
QUERIES = plans.all_queries()


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb_con(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, sf_dir, con, name):
    compare(QUERIES[name](spark, sf_dir), con, ORACLES[name])


def test_every_query_has_an_oracle():
    """Round 8 eliminated the rows-only class: every registered query
    carries a DuckDB oracle. A future oracle-less registration is a
    correctness-coverage regression and must fail loudly here instead
    of silently falling into a weaker rows-only driver check."""
    assert set(QUERIES) == set(ORACLES)
