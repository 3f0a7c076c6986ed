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


# ------------------------------------------------ BM25 evidence package


def test_bm25_postings_plan(spark, sf_dir):
    """The postings seek must compile as: term filter BETWEEN the
    explode and the aggregation (only query-term occurrences cross
    the wire), exactly ONE doc_id exchange, and the n_chars gate
    pushed into the parquet scan."""
    import re

    from eye_of_sauron_spark.functions.text import tokens_spark
    from eye_of_sauron_spark.plans.textual import _bm25_postings
    from eye_of_sauron_spark.sources import load_table

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .select("doc_id", tokens_spark(F.col("text")).alias("toks"))
    )
    plan = _bm25_postings(spark, d)._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning\(doc_id", plan)) == 1
    assert "Exchange hashpartitioning(term" not in plan
    # filter sits above the Generate(explode) and below the exchange
    filt = plan.index("Filter term")
    assert "dup,vector,merge" in plan[filt : filt + 120]
    assert plan.index("Generate explode") > filt > plan.index("Exchange hashpartitioning(doc_id")
    assert "PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,0)]" in plan


def test_bm25_final_plan_reads_materialized_postings(spark, sf_dir):
    """After the postings materialize (localCheckpoint), the final
    plan may contain exactly ONE parquet scan — the 1-row stats
    branch. A second documents scan means Catalyst recompiled the
    corpus-sized explode for the df broadcast (the shape the
    materialization exists to prevent). df/stats broadcast; the
    selection is TakeOrderedAndProject, never a global Sort."""
    from eye_of_sauron_spark.plans.textual import search_bm25_topk

    df = search_bm25_topk(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1
    assert "documents.parquet" in plan  # ... and it is the stats branch
    assert plan.count("Scan ExistingRDD") == 2  # df + per-doc readers
    assert plan.count("BroadcastExchange") == 2  # 3-row df, 1-row stats
    assert "TakeOrderedAndProject" in plan
    assert "Sort [score_e6" not in plan


def test_bm25_ppm_boundary_determinism(spark, tmp_path):
    """Scores are ppm BIGINTs, so ranking is integer selection: a
    1-ppm score gap and an exact score tie are both STABLE across
    engines and runs. Fixture: clones (identical tf/dl -> bit-equal
    doubles -> equal e6, rank decided by the doc_id tiebreak) plus a
    dl ladder (adjacent docs differ by one filler token -> ppm-scale
    score deltas). Spark must match DuckDB exactly, twice (the
    second run rebuilds the postings checkpoint from scratch)."""
    import sys

    sys.path.insert(0, "tests")
    from _oracle import compare

    import duckdb

    from eye_of_sauron_spark.plans.registry import get
    from eye_of_sauron_spark.plans.textual import search_bm25_topk

    rows = []
    # 4 exact clones: same text -> identical scores, doc_id tiebreak
    for i in range(4):
        rows.append((i, "dup dup vector " + "pad " * 10))
    # dl ladder: one extra filler token per doc -> adjacent scores
    # differ at ppm scale (the rounding boundary under test)
    for i in range(4, 40):
        rows.append((i, "dup merge " + "pad " * (5 + i)))
    # background docs so df < n and idf is nondegenerate
    for i in range(40, 120):
        rows.append((i, "filler text only " + "pad " * (i % 7)))
    pdf = pd.DataFrame(
        {"doc_id": [r[0] for r in rows], "text": [r[1].strip() for r in rows]}
    )
    pdf["n_chars"] = pdf["text"].str.len()
    path = str(tmp_path / "documents.parquet")
    pdf.to_parquet(path)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
    oracle = get("search_bm25_topk").oracle
    first = search_bm25_topk(spark, str(tmp_path))
    compare(first, con, oracle)
    out = first.collect()
    # the clone block must appear tie-broken by doc_id, ranks adjacent
    clone_ranks = sorted(r["rank"] for r in out if r["doc_id"] < 4)
    clone_ids = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"]) if r["doc_id"] < 4]
    assert clone_ids == sorted(clone_ids)
    assert clone_ranks == list(range(min(clone_ranks), min(clone_ranks) + len(clone_ranks)))
    # run 2: fresh checkpoint, identical rows
    second = search_bm25_topk(spark, str(tmp_path))
    assert sorted(map(tuple, second.collect())) == sorted(map(tuple, out))


# --------------------------------------------- hybrid RRF retrieval


def test_hybrid_rrf_fusion_arithmetic(spark, sf_dir):
    """The fused score must be EXACTLY the sum of integer
    floor(1e9/(k0+rank)) contributions of whichever branch ranks are
    present — recomputed independently here — with dense output
    ranks and (rrf_ppb desc, doc_id asc) ordering. Branch-rank
    parity with DuckDB is the generic oracle test's job."""
    from eye_of_sauron_spark.plans.textual import (
        _RRF_K0,
        _RRF_TOPK,
        search_hybrid_rrf,
    )

    out = sorted(search_hybrid_rrf(spark, sf_dir).collect(), key=lambda r: r["rank"])
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))
    assert len(out) == _RRF_TOPK
    prev = None
    for r in out:
        expect = sum(
            1_000_000_000 // (_RRF_K0 + rk)
            for rk in (r["lex_rank"], r["vec_rank"])
            if rk is not None
        )
        assert r["rrf_ppb"] == expect, r
        assert r["lex_rank"] is not None or r["vec_rank"] is not None
        if prev is not None:
            assert (prev["rrf_ppb"], -prev["doc_id"]) >= (r["rrf_ppb"], -r["doc_id"])
        prev = r


def test_hybrid_rrf_plan_shape(spark, sf_dir):
    """Each branch's depth-k selection and the final top-k must all
    compile to TakeOrderedAndProject (3 total — never a global
    Sort), and the single-row query vector must broadcast, not
    cartesian-join."""
    from eye_of_sauron_spark.plans.textual import search_hybrid_rrf

    df = search_hybrid_rrf(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("TakeOrderedAndProject") == 3
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
