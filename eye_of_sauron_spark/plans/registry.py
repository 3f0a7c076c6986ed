"""Named-query registry backing ``__spark_entry__.py``.

Every operator from SURVEY.md §2 is exposed as a named callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) an
equivalent ANSI-SQL string the driver runs in DuckDB as a correctness
oracle. Registering both together keeps the column aliases in lockstep
— the driver's compare sorts columns by name before hashing, so every
computed column must carry the same alias on both sides.

Queries that are genuinely not SQL-expressible (stateful streaming,
model-UDF pipelines) register with ``oracle=None`` and get rows-only
driver checks plus pytest unit tests.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None for rows-only
    doc: str


_REGISTRY: dict[str, Query] = {}

# The driver's correctness harness checks at most ~50 registry entries
# per round, in iteration order. Names listed here are emitted FIRST by
# all_queries()/all_oracles() so queries with the OLDEST driver
# evidence re-green before already-fresh ones rotate back in. Unlisted
# names follow in registration order. Rotate this list each round to
# whatever CORRECTNESS_r*.json shows as longest-unchecked — r03 and r04
# pinned the same 50 names and starved the other 21 (VERDICT r04 #4).
_VERIFY_FIRST: tuple[str, ...] = (
    # --- r15 rotation (50 entries = the driver's measured per-round
    # budget) ---
    # BASIS (permanent rule, VERDICT r13 #1): this list is generated
    # from `python tools/evidence_ledger.py` over the CORRECTNESS_r*.json
    # files PRESENT AT ROUND START — never from the prior round's
    # expected outcome. At r15 start the artifacts on disk are
    # CORRECTNESS_r01..r11, r13, r14 (r12 was externally lost), and the
    # ledger reads: 50 r14 / 50 r13 / 50 r11 / 16 r10 / 2 r09 — every
    # registered query has a driver row, so the head is purely the
    # freshness tail. 2 + 16 + 32 = 50 exactly (VERDICT r14 #1).
    # 1) the 2 rows whose latest driver evidence is r09 (displaced from
    # the r14 head by that round's capped new registrations).
    "similarity_lsh_recall",
    "similarity_sq8_recall",
    # 2) the 16 rows whose latest driver evidence is r10.
    "dedup_exact_keep_first",
    "deterministic_sample_documents",
    "funnel_view_click_purchase",
    "heavy_hitters_users",
    "jsonl_roundtrip_ingest",
    "multimodal_frame_sample",
    "semi_join_active_customers",
    "sql_revenue_top_nations",
    "stream_sliding_window",
    "stream_tumbling_window",
    "window_lag_event_gaps",
    "window_lead_transitions",
    "window_moving_avg",
    "window_ntile_spend_quartiles",
    "window_rank_customers",
    "zorder_cluster_events",
    # 3) 32 of the 50 rows whose latest driver evidence is r11. All 50
    # tie on freshness, so the tiebreak is the ledger's own listing
    # order (alphabetical) — mechanical, reproducible from the
    # artifacts, no per-name judgement calls. No new registrations
    # this round (r15 holds the surface cap; the refresh cycle stays
    # at 168/50 ≈ 3.4 rounds), so no displacement.
    "approx_distinct_users",
    "array_vector_scalars",
    "asof_join_click_before_purchase",
    "binary_base64_codec",
    "conditional_agg_event_matrix",
    "corr_hourly_click_purchase",
    "cross_join_region_pairs",
    "datetime_bucketing",
    "decontam_semantic_embedding",
    "dedup_cluster_multimodal",
    "dedup_semantic_cells",
    "dedup_simhash",
    "filter_projection_pushdown",
    "grouping_sets_mixed",
    "histogram_value_buckets",
    "interval_join_activity_before_error",
    "json_extract_props",
    "json_serialize_roundtrip",
    "median_percentiles_value",
    "minmax_by_segment",
    "ml_face_pipeline",
    "multi_distinct_by_priority",
    "multimodal_frame_features",
    "multimodal_resize",
    "pack_sequences",
    "pivot_event_counts",
    "quality_classifier_score",
    "reorder_replay",
    "rollup_orders_by_month",
    "search_hybrid_rrf",
    "setop_except_customers",
    "similarity_topk_cosine",
    # --- deferred to r16: the remaining 18 r11 rows (alphabetically
    # after similarity_topk_cosine: similarity_topk_ivf,
    # split_leakage_neardup, split_train_val_test,
    # stats_acctbal_by_nation, stream_dedup_replay, stream_join_replay,
    # stream_static_match_replay, string_filename_parse,
    # text_language_id, text_quality_score, text_repetition_score,
    # text_term_stats, text_token_counts, tfidf_top_terms,
    # theta_join_acctbal_dominance, topk_per_group_orders,
    # unpivot_part_metrics, window_running_total). After r15 lands the
    # ledger reads 50 r15 / 50 r14 / 50 r13 / 18 r11 — the r16 head is
    # those 18 + the 32 oldest r13 rows. All deferred rows re-green
    # locally in every pytest run (tests/test_queries_oracle.py).
)


def _ordered() -> list[Query]:
    first = [_REGISTRY[n] for n in _VERIFY_FIRST if n in _REGISTRY]
    rest = [q for q in _REGISTRY.values() if q.name not in _VERIFY_FIRST]
    return first + rest


def query(name: str, oracle: str | None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name`` with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in _ordered()}


def all_oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in _ordered() if q.oracle is not None}


def get(name: str) -> Query:
    return _REGISTRY[name]
