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


def test_edit_distance_pairs_verified_and_band_complete(spark, sf_dir):
    import duckdb

    docs = {
        r.doc_id: (r.lang, r.text)
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    got = {
        (r.a_id, r.b_id): (r.edit_dist, r.max_len)
        for r in QUERIES["dedup_edit_distance"](spark, sf_dir).collect()
    }
    con = duckdb.connect()
    lev = lambda a, b: con.execute(  # noqa: E731
        "SELECT levenshtein(?, ?)", [a, b]
    ).fetchone()[0]
    # soundness: every reported pair is ordered, within threshold, and
    # the reported distance is the true Levenshtein distance
    for (a, b), (dist, mlen) in got.items():
        assert a < b
        ta, tb = docs[a][1], docs[b][1]
        assert mlen == max(len(ta), len(tb))
        assert dist == lev(ta, tb)
        assert dist * 100 <= 15 * mlen
    # completeness: re-derive the banding rule (shared 32-char prefix
    # or suffix within a lang, band bucket <= 32) + threshold; every
    # such pair must have been reported
    from collections import defaultdict

    bands = defaultdict(list)
    for did, (lang, text) in docs.items():
        bands[(lang, "p", text[:32])].append(did)
        bands[(lang, "s", text[-32:])].append(did)
    expect = set()
    for ids in bands.values():
        if len(ids) > 32:
            continue
        for i, a in enumerate(sorted(ids)):
            for b in sorted(ids)[i + 1 :]:
                ta, tb = docs[a][1], docs[b][1]
                if lev(ta, tb) * 100 <= 15 * max(len(ta), len(tb)):
                    expect.add((a, b))
    assert set(got) == expect


def test_profile_matches_pandas(spark, sf_dir):
    import math

    rows = load_table(spark, sf_dir, "events").collect()
    got = {r.col_name: r for r in QUERIES["profile_events_columns"](spark, sf_dir).collect()}
    assert set(got) == {"event_id", "user_id", "value_cents", "ts_micros", "event_type"}
    uids = [r.user_id for r in rows]
    assert got["user_id"].n_rows == len(rows)
    assert got["user_id"].n_null == sum(1 for u in uids if u is None)
    assert got["user_id"].n_distinct == len(set(uids))
    assert got["user_id"].min_num == min(uids)
    assert got["user_id"].max_num == max(uids)
    cents = [int(math.floor(r.value * 100 + 0.5)) for r in rows]
    assert got["value_cents"].min_num == min(cents)
    assert got["value_cents"].max_num == max(cents)
    assert got["event_type"].min_str == min(r.event_type for r in rows)
    assert got["event_type"].max_str == max(r.event_type for r in rows)
    assert got["event_type"].min_num is None


def test_validation_rules_fire_correctly(spark, sf_dir):
    rows = load_table(spark, sf_dir, "events").collect()
    got = {r.rule: r for r in QUERIES["validate_events_expectations"](spark, sf_dir).collect()}
    assert got["value_non_negative"].n_violations == sum(1 for r in rows if r.value < 0)
    assert got["value_at_most_500"].n_violations == sum(1 for r in rows if r.value > 500)
    ids = [r.event_id for r in rows]
    assert got["event_id_unique"].n_violations == len(ids) - len(set(ids))
    for r in got.values():
        assert r.n_checked == len(rows)
        assert r.passed == (r.n_violations == 0)


def test_mg_superset_guarantee_property():
    """Any key with true frequency > n/(k+1) must survive the
    Misra-Gries summary regardless of stream order or batching."""
    import random

    import pandas as pd

    from eye_of_sauron_spark.plans.aggregation import _mg_update

    rng = random.Random(7)
    for trial in range(20):
        k = rng.choice([4, 8, 16])
        # skewed stream: a few hot keys + a long uniform tail
        hot = {f"h{i}": rng.randint(50, 200) for i in range(3)}
        tail = {f"t{i}": rng.randint(1, 4) for i in range(200)}
        stream = [u for u, c in {**hot, **tail}.items() for _ in range(c)]
        rng.shuffle(stream)
        n = len(stream)
        counters: dict = {}
        i = 0
        while i < n:
            step = rng.randint(1, 97)
            batch = pd.Series(stream[i : i + step]).value_counts()
            counters = _mg_update(counters, batch, k)
            i += step
        freqs = pd.Series(stream).value_counts()
        for key, f in freqs.items():
            if f * (k + 1) > n:
                assert key in counters, (trial, key, f, n, k)


def test_heavy_hitters_exact_output(spark, sf_dir):
    from collections import Counter

    ev = load_table(spark, sf_dir, "events").collect()
    freqs = Counter(r.user_id for r in ev)
    n = len(ev)
    want = {u: c for u, c in freqs.items() if c * 2000 > n}
    got = {
        r.user_id: r.n_events
        for r in QUERIES["heavy_hitters_users"](spark, sf_dir).collect()
    }
    assert got == want


def test_equi_depth_buckets_balanced_and_ordered(spark, sf_dir):
    got = QUERIES["histogram_equi_depth_value"](spark, sf_dir).collect()
    by_type = defaultdict(list)
    for r in got:
        by_type[r.event_type].append(r)
    for rows in by_type.values():
        rows.sort(key=lambda r: r.bucket)
        n = sum(r.n_rows for r in rows)
        assert [r.bucket for r in rows] == list(range(8))
        for r in rows:
            # equi-depth: every bucket within one row of n/8
            assert abs(r.n_rows - n / 8) <= 1
            assert r.lo_c <= r.hi_c
        for a, b in zip(rows, rows[1:]):
            assert a.hi_c <= b.lo_c  # buckets tile the sorted domain


def test_corr_matches_numpy_reference(spark, sf_dir):
    import numpy as np

    rows = load_table(spark, sf_dir, "events").collect()
    # spine = every hour with ANY event (zero-zero hours are real
    # observations in the paired series, exactly as the query defines)
    hours = defaultdict(lambda: [0, 0])
    for r in rows:
        h = r.ts.replace(minute=0, second=0, microsecond=0)
        hours[h]  # materialize the hour even for other event types
        if r.event_type == "click":
            hours[h][0] += 1
        elif r.event_type == "purchase":
            hours[h][1] += 1
    x = np.array([v[0] for v in hours.values()], dtype=float)
    y = np.array([v[1] for v in hours.values()], dtype=float)
    r_np = np.corrcoef(x, y)[0, 1]
    got = QUERIES["corr_hourly_click_purchase"](spark, sf_dir).collect()[0]
    assert got.n_hours == len(hours)
    assert got.sign == (1 if r_np > 0 else -1 if r_np < 0 else 0)
    # integer-exact ppm vs float reference: within one ppm of floor
    assert abs(got.r2_ppm - int(r_np * r_np * 1_000_000)) <= 1
