"""Invariant tests for the round-6c operators (skyline, robust stats,
OHLC, trigrams, char diversity, percent_rank) — each pins the semantic
claim the docstring makes, independent of the DuckDB oracle run in
tests/test_queries_oracle.py."""

from __future__ import annotations

from collections import defaultdict

from eye_of_sauron_spark import plans
from eye_of_sauron_spark.sources import load_table

QUERIES = plans.all_queries()


def _cents(x: float) -> int:
    import math

    return int(math.floor(x * 100 + 0.5))


def test_skyline_matches_bruteforce_dominance(spark, sf_dir):
    rows = [
        (r.o_orderkey, r.o_orderdate, _cents(r.o_totalprice))
        for r in load_table(spark, sf_dir, "orders").collect()
    ]
    frontier = set()
    for k, d, p in rows:
        dominated = any(
            (d2 >= d and p2 <= p) and (d2 > d or p2 < p)
            for _, d2, p2 in rows
        )
        if not dominated:
            frontier.add(k)
    got = QUERIES["skyline_pareto_orders"](spark, sf_dir).collect()
    assert {r.o_orderkey for r in got} == frontier
    assert all(r.price_cents == _cents_of(rows, r.o_orderkey) for r in got)


def _cents_of(rows, key):
    return next(p for k, _, p in rows if k == key)


def test_skyline_frontier_is_monotone(spark, sf_dir):
    # among frontier rows, a strictly later date must cost strictly
    # more (else the later row would dominate the earlier one)
    got = sorted(
        QUERIES["skyline_pareto_orders"](spark, sf_dir).collect(),
        key=lambda r: (r.o_orderdate, r.price_cents),
    )
    for a, b in zip(got, got[1:]):
        if b.o_orderdate > a.o_orderdate:
            assert b.price_cents > a.price_cents
        else:
            assert b.price_cents == a.price_cents  # same-date ties tie on price


def test_winsorize_clips_only_tails_to_data_values(spark, sf_dir):
    out = QUERIES["winsorize_values_by_type"](spark, sf_dir).collect()
    by_type = defaultdict(list)
    for r in out:
        by_type[r.event_type].append(r)
    for rows in by_type.values():
        vals = sorted(r.value_cents for r in rows)
        valset = set(vals)
        n = len(vals)
        k_lo, k_hi = (5 * n + 99) // 100, (95 * n + 99) // 100
        lo, hi = vals[k_lo - 1], vals[k_hi - 1]
        for r in rows:
            assert lo <= r.clipped_cents <= hi
            assert r.clipped_cents in valset  # rank-based: a real value
            if lo <= r.value_cents <= hi:
                assert r.clipped_cents == r.value_cents  # body untouched
            else:
                assert r.clipped_cents in (lo, hi)


def test_zscore_matches_exact_integer_reference(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").collect()
    groups = defaultdict(list)
    for r in ev:
        groups[r.event_type].append(_cents(r.value))
    expect = {}
    for t, xs in groups.items():
        n, s, q = len(xs), sum(xs), sum(x * x for x in xs)
        expect[t] = (
            n,
            sum(1 for x in xs if (n * x - s) ** 2 > 4 * (n * q - s * s)),
        )
    got = QUERIES["anomaly_zscore_events"](spark, sf_dir).collect()
    assert {r.event_type: (r.n_total, r.n_anomalies) for r in got} == expect


def test_ohlc_candle_invariants(spark, sf_dir):
    for r in QUERIES["timeseries_ohlc_resample"](spark, sf_dir).collect():
        assert r.low_c <= min(r.open_c, r.close_c)
        assert r.high_c >= max(r.open_c, r.close_c)
        assert r.n_ticks >= 1
        assert r.n_ticks * r.low_c <= r.vol_c <= r.n_ticks * r.high_c


def test_trigram_totals_conserve_sequence_length(spark, sf_dir):
    per_user = defaultdict(int)
    for r in load_table(spark, sf_dir, "events").collect():
        per_user[r.user_id] += 1
    want = sum(max(0, n - 2) for n in per_user.values())
    got = QUERIES["event_sequence_trigrams"](spark, sf_dir).collect()
    assert sum(r.n for r in got) == want


def test_char_diversity_bounds(spark, sf_dir):
    for r in QUERIES["text_char_diversity"](spark, sf_dir).collect():
        # Cauchy-Schwarz floor and the uniform-best / single-char-worst caps
        assert (10**6) // r.n_distinct_chars <= r.simpson_ppm <= 10**6
        assert 1 <= r.n_distinct_chars <= r.n_chars_tot


def test_percent_rank_cume_dist_ranges(spark, sf_dir):
    rows = QUERIES["window_percent_rank_acctbal"](spark, sf_dir).collect()
    by_nation = defaultdict(list)
    for r in rows:
        assert 0.0 <= r.pr <= 1.0
        assert 0.0 < r.cd <= 1.0
        by_nation[r.c_nationkey].append(r)
    for vs in by_nation.values():
        assert max(v.cd for v in vs) == 1.0
        if len(vs) > 1:
            assert min(v.pr for v in vs) == 0.0
