"""Invariant tests for the round-6 operator additions — each pins the
semantic claim the operator's docstring makes, independent of the
DuckDB oracle comparison (tests/test_queries_oracle.py covers exact
value equality)."""

from __future__ import annotations

from eye_of_sauron_spark import plans
from eye_of_sauron_spark.plans.dedup import _INC_RECRAWL_OFFSET
from eye_of_sauron_spark.plans.storage import _Z_BITS, _Z_BUCKET_SHIFT

QUERIES = plans.all_queries()


def test_funnel_stages_are_monotone(spark, sf_dir):
    rows = {
        r.stage: r
        for r in QUERIES["funnel_view_click_purchase"](spark, sf_dir).collect()
    }
    assert set(rows) == {"1_view", "2_click", "3_purchase"}
    # ordered-subsequence reach can only shrink stage over stage
    assert rows["1_view"].n_users >= rows["2_click"].n_users
    assert rows["2_click"].n_users >= rows["3_purchase"].n_users
    for r in rows.values():
        assert r.conv is None or 0.0 <= r.conv <= 1.0


def test_quality_filter_keep_iff_pass(spark, sf_dir):
    rows = QUERIES["quality_filter_pipeline"](spark, sf_dir).collect()
    allowed = {"pass", "length", "repetition", "word_length", "stopword"}
    assert rows
    for r in rows:
        assert r.first_fail in allowed
        assert r.keep == (r.first_fail == "pass")


def test_incremental_dedup_recrawl_is_exact(spark, sf_dir):
    rows = QUERIES["dedup_incremental_corpus"](spark, sf_dir).collect()
    recrawled = [r for r in rows if r.doc_id >= _INC_RECRAWL_OFFSET]
    # every planted re-crawl duplicates a corpus doc verbatim: the
    # exact probe must catch ALL of them (near/keep would be a miss)
    assert recrawled
    assert all(r.verdict == "exact" for r in recrawled)


def test_int8_quantize_extreme_level_invariant(spark, sf_dir):
    rows = QUERIES["embedding_int8_quantize"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # the max-magnitude component maps exactly to +/-127
        assert r.n_extreme >= 1
        assert r.scale > 0
        assert r.mse >= 0


def test_zorder_bounds_both_dimension_spans(spark, sf_dir):
    rows = QUERIES["zorder_cluster_events"](spark, sf_dir).collect()
    assert rows
    # dropping _Z_BUCKET_SHIFT interleaved low bits leaves
    # _Z_BUCKET_SHIFT/2 free bits per dimension inside a bucket
    bound = (1 << (_Z_BUCKET_SHIFT // 2)) - 1
    for r in rows:
        assert 0 <= r.u_span <= bound, r
        assert 0 <= r.t_span <= bound, r
        assert r.zbucket < 1 << (2 * _Z_BITS - _Z_BUCKET_SHIFT)
