"""Round-9 additions: small-group sketch-contract clamp, bucketed
stateful funnel parity, and the RocksDB state-store option."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def test_sketch_contract_survives_tiny_groups(spark, tmp_path):
    """The r08-advice scenario: a group with n < 100 rows, where the
    q +/- 0.01 window is narrower than one discrete rank. With 3 rows
    the old bracket could flip p50_ok/p90_ok/p99_ok false; the min/max
    clamp keeps every booleans TRUE (the sketch answer is an element
    of the group, so membership bounds always hold)."""
    from eye_of_sauron_spark.plans.aggregation import sketch_quantiles_value

    path = str(tmp_path / "events.parquet")
    pd.DataFrame(
        {
            "event_type": ["tiny"] * 3 + ["alsotiny"] * 7,
            "value": [1.0, 2.0, 100.0] + [float(i) for i in range(7)],
            "ts": pd.to_datetime(["2026-01-01"] * 10),
        }
    ).to_parquet(path)
    out = sketch_quantiles_value(spark, str(tmp_path)).collect()
    assert len(out) == 2
    for r in out:
        assert r["p50_ok"] and r["p90_ok"] and r["p99_ok"], r
