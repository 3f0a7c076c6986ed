"""Aggregate semantics not expressible as a DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from eye_of_sauron_spark import plans
from eye_of_sauron_spark.sources import load_table


def test_approx_distinct_within_error_bound(spark, sf_dir):
    """approx_count_distinct(rsd=0.01) must land within a loose 5%
    of the exact per-group distinct count (HLL++ with rsd 1% is far
    tighter in practice; 5% keeps the test robust across seeds)."""
    approx = {
        r["event_type"]: r["approx_users"]
        for r in plans.all_queries()["approx_distinct_users"](spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["exact_users"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, exact_n in exact.items():
        assert abs(approx[k] - exact_n) <= max(1, 0.05 * exact_n), (
            k,
            approx[k],
            exact_n,
        )
