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
    # --- r06 rotation (50 slots, ~57 never-checked competing) ---
    # 1) registered THIS session, never driver-checked, newest code
    "heavy_hitters_users",
    "histogram_equi_depth_value",
    "corr_hourly_click_purchase",
    "dedup_edit_distance",
    "profile_events_columns",
    "validate_events_expectations",
    "skyline_pareto_orders",
    "winsorize_values_by_type",
    "anomaly_zscore_events",
    "timeseries_ohlc_resample",
    "event_sequence_trigrams",
    "text_char_diversity",
    "window_percent_rank_acctbal",
    # 2) VERDICT r05 #1: plans/dedup.py was rewritten AFTER these were
    # last checked (r04) — fresh rows convert green-but-stale to green
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "dedup_cluster_components",
    # plan-shape changed this round (explode_outer / non-null join key)
    "dedup_ngram_jaccard",
    "similarity_topk_lsh",
    # 3) the rest of the never-checked r06 registrations, EXCEPT a
    # deferred dozen with the strongest independent evidence (golden
    # roundtrips / property tests / probes) listed after the cut so
    # the 50-slot budget closes — they lead the r07 rotation
    "stream_cdc_apply_replay",
    "stream_session_replay",
    "stream_funnel_replay",
    "stream_window_replay",
    "stream_update_mode_replay",
    "stream_left_join_replay",
    "stream_restart_replay",
    "stream_rebroadcast_replay",
    "kafka_decode_replay",
    "similarity_lsh_recall",
    "similarity_ivf_recall",
    "similarity_sq8_recall",
    "similarity_topk_sq8_rerank",
    "textrank_keywords",
    "text_bigram_lm",
    "text_lm_score",
    "cdc_latest_snapshot",
    "scd2_merge_customers",
    "cohort_retention_orders",
    "dataset_diff_snapshots",
    "mixture_temperature_sample",
    "decontam_source_overlap_matrix",
    "embedding_centroid_stats",
    "kmeans_lloyd_step",
    "pca_power_iteration",
    "graph_triangle_census",
    "market_basket_part_pairs",
    "range_join_time_buckets",
    "timeseries_gap_fill",
    "curation_pipeline_e2e",
    "dedup_incremental_corpus",
    "join_salted_skew",
    # --- the ~50-slot cut lands here ---
    # deferred never-checked (lead r07): golden/property/pytest-backed
    "join_bucketed_colocated",
    "jsonl_roundtrip_ingest",
    "csv_roundtrip_ingest",
    "compact_small_files",
    "schema_evolution_ingest",
    "zorder_cluster_events",
    "embedding_int8_quantize",
    "funnel_view_click_purchase",
    "quality_filter_pipeline",
    "mixture_cap_per_source",
    "window_time_range_rolling",
    "dedup_substring_spans",
    "decontaminate_ngram_overlap",
    # then the oldest driver evidence (r04 block)
    "ml_face_pipeline",
    "ml_match_first_target",
    "dedup_exact",
    "dedup_exact_keep_first",
    "grouped_map_session_stats",
    "sql_revenue_top_nations",
    "correlated_subquery_above_avg",
    "flagship_purchases_by_nation",
    "pricing_summary",
    "join_revenue_by_priority",
    "semi_join_active_customers",
    "anti_join_silent_customers",
    "outer_join_order_count_histogram",
    "doc_fingerprint",
    "text_pii_scrub",
    "deterministic_sample_documents",
    "text_chunking",
    "window_rank_customers",
    "window_running_total",
    "window_lag_event_gaps",
    "window_moving_avg",
    "window_lead_transitions",
    "window_ntile_spend_quartiles",
    "window_first_match_semantics",
    "multimodal_image_stats",
    "multimodal_frame_sample",
    "stream_tumbling_window",
    "stream_sliding_window",
    "stream_session_window",
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
