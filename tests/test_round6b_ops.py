"""Invariant tests for the round-6 continuation operators (CDC
compaction, SCD2 merge, bigram LM, session-window replay) — each pins
the semantic claim the operator's docstring makes, independent of the
DuckDB oracle comparison in tests/test_queries_oracle.py."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from eye_of_sauron_spark import plans
from eye_of_sauron_spark.plans.warehouse import _INSERT_OFFSET, _TOMBSTONE
from eye_of_sauron_spark.sources import load_table

QUERIES = plans.all_queries()


def test_cdc_snapshot_is_last_writer_wins(spark, sf_dir):
    snap = {
        r.user_id: r for r in QUERIES["cdc_latest_snapshot"](spark, sf_dir).collect()
    }
    ev = sorted(
        load_table(spark, sf_dir, "events").collect(),
        key=lambda r: (r.ts, r.event_id),
    )
    last = {}
    for r in ev:
        last[r.user_id] = r
    # present iff the key's final op is not the tombstone; value/ts match it
    for uid, r in last.items():
        if r.event_type == _TOMBSTONE:
            assert uid not in snap
        else:
            assert snap[uid].last_ts == r.ts
    assert set(snap) == {u for u, r in last.items() if r.event_type != _TOMBSTONE}


def test_scd2_merge_version_chains(spark, sf_dir):
    rows = QUERIES["scd2_merge_customers"](spark, sf_dir).collect()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.c_custkey, []).append(r)
    dim_keys = {
        r.c_custkey for r in load_table(spark, sf_dir, "customer").collect()
    }
    assert set(by_key) >= dim_keys  # every dimension row survives the merge
    inserts = {k for k in by_key if k >= _INSERT_OFFSET}
    assert inserts  # the WHEN-NOT-MATCHED arm fired
    for key, vs in by_key.items():
        current = [v for v in vs if v.is_current]
        assert len(current) == 1  # exactly one open version per key
        versions = sorted(v.version for v in vs)
        assert versions in ([1], [1, 2])
        if versions == [1, 2]:  # changed key: v1 closed, v2 open
            assert not next(v for v in vs if v.version == 1).is_current
            assert next(v for v in vs if v.version == 2).is_current
        if key in inserts:
            assert versions == [1] and vs[0].segment == "NEW"


def test_bigram_lm_conditionals_are_consistent(spark, sf_dir):
    rows = QUERIES["text_bigram_lm"](spark, sf_dir).collect()
    assert rows
    per_lang: dict[str, list] = {}
    for r in rows:
        per_lang.setdefault(r.lang, []).append(r)
        assert 1 <= r.rank <= 5
        assert 1 <= r.n_pair <= r.n_first
        assert 0 < r.cond_ppm <= 1_000_000
        assert r.cond_ppm == r.n_pair * 1_000_000 // r.n_first
    for vs in per_lang.values():
        vs.sort(key=lambda r: r.rank)
        pair_counts = [r.n_pair for r in vs]
        assert pair_counts == sorted(pair_counts, reverse=True)


def test_session_replay_emits_only_watermark_closed_sessions(spark, sf_dir):
    rows = QUERIES["stream_session_replay"](spark, sf_dir).collect()
    assert rows
    max_ts = load_table(spark, sf_dir, "events").agg(F.max("ts")).collect()[0][0]
    wm = max_ts - datetime.timedelta(hours=2)
    gap = datetime.timedelta(minutes=10)
    by_user: dict[int, list] = {}
    for r in rows:
        assert r.session_end <= wm  # the append-mode gate
        assert r.session_end >= r.session_start + gap  # end is last_ts + gap
        by_user.setdefault(r.user_id, []).append(r)
    for vs in by_user.values():
        vs.sort(key=lambda r: r.session_start)
        for a, b in zip(vs, vs[1:]):
            # sessions are maximal: consecutive sessions never overlap
            # (>= not >: a next event exactly gap-after the last one
            # legitimately starts a session that touches the boundary)
            assert b.session_start >= a.session_end


def test_cdc_apply_converges_to_batch_compaction(spark, sf_dir):
    # the incremental foreachBatch merge and the one-shot batch
    # compaction must produce the SAME snapshot
    inc = sorted(
        (r.user_id, r.last_cents, r.last_ts, r.n_ops)
        for r in QUERIES["stream_cdc_apply_replay"](spark, sf_dir).collect()
    )
    batch = sorted(
        (r.user_id, r.last_cents, r.last_ts, r.n_ops)
        for r in QUERIES["cdc_latest_snapshot"](spark, sf_dir).collect()
    )
    assert inc == batch


def test_textrank_conserves_bounded_mass(spark, sf_dir):
    from eye_of_sauron_spark.plans.textual import _TR_TOPK, _TR_TOTAL

    rows = QUERIES["textrank_keywords"](spark, sf_dir).collect()
    assert rows
    per_lang: dict[str, list] = {}
    for r in rows:
        per_lang.setdefault(r.lang, []).append(r)
        # no node can exceed total graph mass; every rank is positive
        assert 0 < r.m < _TR_TOTAL
    for vs in per_lang.values():
        assert len(vs) == _TR_TOPK
        vs.sort(key=lambda r: r.rank)
        ms = [r.m for r in vs]
        assert ms == sorted(ms, reverse=True)  # rank order == mass order
        # top tokens concentrate mass: strictly above the uniform start
        # for a graph with any structure at all
        assert vs[0].m > vs[-1].m or len(set(ms)) == 1


def test_lm_score_bounds_and_coverage(spark, sf_dir):
    rows = QUERIES["text_lm_score"](spark, sf_dir).collect()
    assert rows
    docs = load_table(spark, sf_dir, "documents").collect()
    multi_tok = {d.doc_id for d in docs if len(d.text.split(" ")) >= 2}
    assert {r.doc_id for r in rows} == multi_tok  # every scorable doc scored
    for r in rows:
        # a conditional mean lives in (0, 1e6]; a doc of one repeated
        # unique continuation would hit exactly 1e6
        assert 0 < r.score_ppm <= 1_000_000
        assert r.n_bigrams >= 1


def test_cdc_apply_epoch_retry_reads_pre_epoch_generation():
    # at-least-once foreachBatch: a retried epoch must NOT read its own
    # partial output (it would double-accumulate n_ops) — it re-reads
    # the last generation of an EARLIER epoch, and its re-write
    # replaces the failed attempt's history entry
    from eye_of_sauron_spark.streaming.replay import (
        _cdc_read_gen,
        _cdc_record_gen,
    )

    hist: list[tuple[int, str]] = []
    assert _cdc_read_gen(hist, 0) is None
    _cdc_record_gen(hist, 0, "gen0")
    assert _cdc_read_gen(hist, 1) == "gen0"
    _cdc_record_gen(hist, 1, "gen1")
    # epoch 1 retried after recording: reads gen0 again, not gen1
    assert _cdc_read_gen(hist, 1) == "gen0"
    _cdc_record_gen(hist, 1, "gen1-retry")
    assert hist == [(0, "gen0"), (1, "gen1-retry")]
    assert _cdc_read_gen(hist, 2) == "gen1-retry"


def test_source_overlap_matrix_is_symmetric_ordered(spark, sf_dir):
    rows = QUERIES["decontam_source_overlap_matrix"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.src_a < r.src_b  # canonical pair order, no mirror rows
        assert r.n_shared_spans >= 1
    assert len({(r.src_a, r.src_b) for r in rows}) == len(rows)


def test_centroid_stats_shape_and_norm_bound(spark, sf_dir):
    rows = QUERIES["embedding_centroid_stats"](spark, sf_dir).collect()
    assert {r.label for r in rows} == set(range(10))
    for r in rows:
        # centroid_micro is a comma-joined string since the r07 driver
        # canonicalization (plans/vector.py) — parse before asserting
        centroid = [int(v) for v in r.centroid_micro.split(",")]
        assert len(centroid) == 64  # full dim, reassembled in order
        assert r.n_vecs >= 1
        # Jensen: the centroid's norm can never exceed the mean norm
        # (micro-unit quantization slack: dim * 1 micro per component)
        norm_c = sum(v * v for v in centroid) ** 0.5
        assert norm_c <= r.avg_norm_micro + 64


def test_cohort_retention_triangle_invariants(spark, sf_dir):
    rows = QUERIES["cohort_retention_orders"](spark, sf_dir).collect()
    assert rows
    by_cohort: dict = {}
    for r in rows:
        assert r.k >= 0
        by_cohort.setdefault(r.cohort, {})[r.k] = r.n_customers
    for ks in by_cohort.values():
        assert 0 in ks  # the cohort month itself always has its members
        # k=0 counts EVERY cohort member, so it bounds every later month
        assert all(v <= ks[0] for v in ks.values())


def test_temperature_sampling_flattens_the_mixture(spark, sf_dir):
    rows = QUERIES["mixture_temperature_sample"](spark, sf_dir).collect()
    assert rows
    by_rate = sorted(rows, key=lambda r: r.n_docs)
    for r in rows:
        assert 0 < r.rate_ppm <= 1_000_000
        assert 0 <= r.n_kept <= r.n_docs
    # tau = 0.5 must up-weight small sources: keep-rates are
    # monotonically non-increasing in source size
    rates = [r.rate_ppm for r in by_rate]
    for a, b in zip(rates, rates[1:]):
        assert b <= a


def test_dataset_diff_all_classes_fire_and_balance(spark, sf_dir):
    rows = QUERIES["dataset_diff_snapshots"](spark, sf_dir).collect()
    assert rows
    tot = {
        k: sum(getattr(r, k) for r in rows)
        for k in ("n_added", "n_removed", "n_changed", "n_unchanged")
    }
    assert all(v > 0 for v in tot.values())  # every diff class fires
    n_docs = load_table(spark, sf_dir, "documents").count()
    # A-side accounting: every original doc is removed, changed, or
    # unchanged, exactly once
    assert tot["n_removed"] + tot["n_changed"] + tot["n_unchanged"] == n_docs


def test_curation_pipeline_accounts_for_every_document(spark, sf_dir):
    rows = QUERIES["curation_pipeline_e2e"](spark, sf_dir).collect()
    statuses = {r.status: r for r in rows}
    n_docs = load_table(spark, sf_dir, "documents").count()
    # exact partition: every doc lands in exactly one status
    assert sum(r.n_docs for r in rows) == n_docs
    assert {"train", "val", "test"} <= set(statuses)
    for r in rows:
        assert r.total_tokens >= r.n_docs  # >= 1 token per doc
    # e2e keeper statuses must agree with the standalone split operator
    # when the corpus has no dups/failures in a split (coarse check:
    # train+val+test <= total)
    kept = sum(statuses[s].n_docs for s in ("train", "val", "test"))
    assert 0 < kept <= n_docs


def test_kmeans_step_partitions_the_corpus(spark, sf_dir):
    rows = QUERIES["kmeans_lloyd_step"](spark, sf_dir).collect()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_members for r in rows) == n_vecs  # exact partition
    assert len(rows) <= 8 and rows
    for r in rows:
        assert len([int(v) for v in r.centroid_micro.split(",")]) == 64
        assert r.inertia_micro >= 0
        assert 0 <= r.cluster_id < 8


def test_stream_funnel_matches_batch_funnel(spark, sf_dir):
    stream = {
        r.stage: r.n_users
        for r in QUERIES["stream_funnel_replay"](spark, sf_dir).collect()
    }
    batch = {
        r.stage: r.n_users
        for r in QUERIES["funnel_view_click_purchase"](spark, sf_dir).collect()
    }
    assert stream == batch  # state across micro-batches == windows
    assert stream["1_view"] >= stream["2_click"] >= stream["3_purchase"]


def test_gap_fill_series_is_dense_and_locf(spark, sf_dir):
    import datetime

    rows = QUERIES["timeseries_gap_fill"](spark, sf_dir).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    hour = datetime.timedelta(hours=1)
    for vs in by_user.values():
        vs.sort(key=lambda r: r.h)
        # dense: consecutive rows exactly one hour apart, no gaps
        for a, b in zip(vs, vs[1:]):
            assert b.h - a.h == hour
        # boundary hours contain real activity by construction
        assert vs[0].n_events > 0 and vs[-1].n_events > 0
        last = None
        for r in vs:
            if r.n_events == 0:
                assert r.ff_cents == last  # LOCF holds through gaps
            last = r.ff_cents


def test_market_basket_metrics_consistent(spark, sf_dir):
    rows = QUERIES["market_basket_part_pairs"](spark, sf_dir).collect()
    assert rows and len(rows) <= 20
    counts = [r.pair_cnt for r in sorted(rows, key=lambda r: r.rank)]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert r.part_a < r.part_b
        assert r.pair_cnt >= 1
        assert 0 < r.support_ppm <= 1_000_000
        assert r.lift_ppm > 0


def test_triangle_census_bounds(spark, sf_dir):
    rows = QUERIES["graph_triangle_census"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_edges > 0 and r.n_wedges >= 0
        assert 0 <= r.n_triangles
        # each triangle contains exactly 3 wedges: closure <= 1
        assert 0 <= r.closure_ppm <= 1_000_000
        assert r.n_triangles * 3 <= r.n_wedges or r.n_wedges == 0


def test_pca_loading_is_unit_and_converged(spark, sf_dir):
    import numpy as np

    rows = QUERIES["pca_power_iteration"](spark, sf_dir).collect()
    assert len(rows) == 64
    v = np.array(
        [r.loading_micro for r in sorted(rows, key=lambda r: r.pos)],
        dtype=np.float64,
    ) / 1e6
    # normalized to unit length (micro-quantization slack)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-3
    # matches numpy's top eigenvector direction on the same data
    emb = np.array(
        [r.embedding for r in load_table(spark, sf_dir, "embeddings").collect()],
        dtype=np.float64,
    )
    g = emb.T @ emb
    w, _ = np.linalg.eigh(g)
    v0 = np.full(64, 0.125)
    rayleigh = lambda x: float(x @ g @ x) / float(x @ x)  # noqa: E731
    # the synthetic corpus is near-isotropic (top eigs 14.4 vs 13.5 at
    # sf0.001), so 3 rounds cannot ALIGN with the top eigenvector —
    # the honest power-iteration invariants are monotone Rayleigh
    # improvement within the spectrum
    assert rayleigh(v) > rayleigh(v0) * 1.2
    assert rayleigh(v) <= w[-1] + 1e-6
