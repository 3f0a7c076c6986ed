"""Aggregate semantics not expressible as a DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from eye_of_sauron_spark import plans
from eye_of_sauron_spark.sources import load_table


def test_approx_distinct_within_error_bound(spark, sf_dir):
    """approx_count_distinct(rsd=0.01) must land within a loose 5%
    of the exact per-group distinct count (HLL++ with rsd 1% is far
    tighter in practice; 5% keeps the test robust across seeds). The
    bound is computed in-plan (within_bound) since r08; the test also
    re-derives the exact side independently."""
    rows = plans.all_queries()["approx_distinct_users"](spark, sf_dir).collect()
    got = {r["event_type"]: r for r in rows}
    exact = {
        r["event_type"]: r["exact_users"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, exact_n in exact.items():
        assert got[k]["exact_users"] == exact_n
        assert got[k]["within_bound"] is True, (k, got[k])


def test_sketch_quantiles_bounded_error(spark, sf_dir):
    """approx_percentile's estimate must sit within a small rank
    neighborhood of the exact percentile (accuracy=10000 => rank
    error <= n/10000 per group; assert value-wise closeness)."""
    from pyspark.sql import functions as F

    from eye_of_sauron_spark.plans.aggregation import sketch_quantiles_value
    from eye_of_sauron_spark.sources import load_table

    # the registered query emits in-plan booleans (r08); assert them,
    # then re-derive the raw rank error from the sketch directly
    for r in sketch_quantiles_value(spark, sf_dir).collect():
        assert r["p50_ok"] and r["p90_ok"] and r["p99_ok"], r

    events = load_table(spark, sf_dir, "events").select("event_type", "value")
    got = {
        r["event_type"]: list(r["ap"])
        for r in events.groupBy("event_type")
        .agg(F.percentile_approx("value", [0.5, 0.9, 0.99], 10_000).alias("ap"))
        .collect()
    }
    # the sketch guarantees RANK error (<= n/accuracy + floor effects),
    # not value error: verify each estimate's actual rank is near q
    for et, estimates in got.items():
        vals = [r["value"] for r in events.filter(F.col("event_type") == et).collect()]
        n = len(vals)
        for q, a in zip([0.5, 0.9, 0.99], estimates):
            rank = sum(v <= a for v in vals) / n
            assert abs(rank - q) <= 1 / 10_000 + 2 / n + 0.005, (et, q, a, rank)
