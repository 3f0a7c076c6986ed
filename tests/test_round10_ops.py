"""Round-10 additions: the all-NULL-group sketch-contract
short-circuit and the live-session RocksDB conf fix (both r09 ADVICE
items), plus the BM25 evidence package and the observe()-metrics
replay."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_sketch_contract_all_null_group(spark, tmp_path):
    """A group whose value column is ENTIRELY NULL has nothing to
    rank: n_vals=0, NULL vmin/vmax, NULL percentile_approx. The old
    bracket evaluated p*_ok to NULL there, mismatching the oracle's
    constant TRUE; the short-circuit makes the contract hold
    vacuously (r09 ADVICE, aggregation.py)."""
    import duckdb

    from eye_of_sauron_spark.plans.aggregation import sketch_quantiles_value
    from eye_of_sauron_spark.plans.registry import get

    path = str(tmp_path / "events.parquet")
    pd.DataFrame(
        {
            "event_type": ["allnull"] * 40 + ["normal"] * 200,
            "value": [None] * 40 + [float(i) for i in range(200)],
            "ts": pd.to_datetime(["2026-01-01"] * 240),
        }
    ).to_parquet(path)
    rows = {
        r["event_type"]: r for r in sketch_quantiles_value(spark, str(tmp_path)).collect()
    }
    assert len(rows) == 2
    for et, r in rows.items():
        assert r["p50_ok"] is True and r["p90_ok"] is True and r["p99_ok"] is True, r
    # and the DuckDB oracle agrees on the same fixture
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')")
    oracle = {
        r[0]: r
        for r in con.execute(get("sketch_quantiles_value").oracle).fetchall()
    }
    assert set(oracle) == set(rows)
    for et in oracle:
        assert oracle[et][1] == rows[et]["n_events"]


def test_get_spark_rocksdb_applies_to_existing_session(spark):
    """getOrCreate ignores builder configs when the JVM session
    already exists — get_spark(state_store='rocksdb') must still
    flip the provider (it is a runtime SQL conf read at stream
    start), not silently keep the heap provider (r09 ADVICE,
    session.py)."""
    from eye_of_sauron_spark.session import _ROCKSDB_PROVIDER, get_spark

    key = "spark.sql.streaming.stateStore.providerClass"
    changelog = (
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    )
    default = spark.conf.get(key)
    assert "RocksDB" not in default
    try:
        same = get_spark(state_store="rocksdb")
        assert same is spark  # session reuse is the scenario under test
        assert spark.conf.get(key) == _ROCKSDB_PROVIDER
        assert spark.conf.get(changelog) == "true"
    finally:
        spark.conf.set(key, default)
        spark.conf.unset(changelog)


def test_observe_metrics_replay_dense_batches(spark, sf_dir):
    """The A8 driver query's rows must come out DENSE (batch 0..n-1,
    no gaps even if an empty flush batch lands on the listener bus)
    and account for every input row exactly once — the listener-side
    equivalent of delivery accounting. The value/hash parity with the
    closed-form octile oracle is the generic oracle test's job."""
    from eye_of_sauron_spark.sources.tables import load_table
    from eye_of_sauron_spark.streaming.replay import (
        stream_observe_metrics_replay,
    )

    out = stream_observe_metrics_replay(spark, sf_dir).collect()
    assert [r["batch"] for r in sorted(out, key=lambda r: r["batch"])] == list(
        range(len(out))
    )
    assert 2 <= len(out) <= 8
    total = load_table(spark, sf_dir, "events").count()
    assert sum(r["n_rows"] for r in out) == total
    assert all(r["latency_pos"] for r in out)
    assert all(r["min_ts_us"] <= r["max_ts_us"] for r in out)


def test_metrics_listener_custom_observation_name():
    """MetricsListener(observation=...) keys observedMetrics lookup
    by the given name (default stays OBSERVATION)."""
    from eye_of_sauron_spark.streaming.metrics import (
        OBSERVATION,
        MetricsListener,
    )

    assert MetricsListener().observation == OBSERVATION
    assert MetricsListener("replay_obs").observation == "replay_obs"
