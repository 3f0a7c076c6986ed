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
    # registered this session, never driver-checked — need first rows
    "heavy_hitters_users",
    "histogram_equi_depth_value",
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
    "cdc_latest_snapshot",
    "scd2_merge_customers",
    "text_bigram_lm",
    "stream_session_replay",
    "stream_cdc_apply_replay",
    "textrank_keywords",
    "text_lm_score",
    "decontam_source_overlap_matrix",
    "embedding_centroid_stats",
    "cohort_retention_orders",
    "mixture_temperature_sample",
    "dataset_diff_snapshots",
    "range_join_time_buckets",
    "curation_pipeline_e2e",
    "kmeans_lloyd_step",
    "stream_funnel_replay",
    "timeseries_gap_fill",
    "market_basket_part_pairs",
    "graph_triangle_census",
    "pca_power_iteration",
    "join_salted_skew",
    "join_bucketed_colocated",
    "stream_left_join_replay",
    # r06 rotation: plans/dedup.py was rewritten heavily in r05 AFTER
    # these three were last driver-checked (r04) — fresh rows convert
    # "green-but-stale" into green (VERDICT r05 #1).
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "dedup_cluster_components",
    # plan-shape changes this session (explode_outer / non-nullable
    # join key) — need post-change driver rows
    "dedup_ngram_jaccard",
    "similarity_topk_lsh",
    # model-UDF pipelines, last checked r04 (face pipeline is a
    # rows-only driver check — weakest signal, strong pytest — so it
    # yields its top-50 slot to the exact-hash restart replay)
    "ml_match_first_target",
    "stream_restart_replay",
    # modified or first registered this round (r06) — need evidence
    "funnel_view_click_purchase",
    "quality_filter_pipeline",
    "dedup_incremental_corpus",
    "embedding_int8_quantize",
    "zorder_cluster_events",
    "similarity_topk_sq8_rerank",
    "similarity_sq8_recall",
    "window_time_range_rolling",
    "stream_window_replay",
    "stream_update_mode_replay",
    "compact_small_files",
    "schema_evolution_ingest",
    "tfidf_top_terms",
    "stream_rebroadcast_replay",
    "kafka_decode_replay",
    "similarity_lsh_recall",
    "similarity_ivf_recall",
    "decontaminate_ngram_overlap",
    "dedup_substring_spans",
    "mixture_cap_per_source",
    "ml_face_pipeline",
    "jsonl_roundtrip_ingest",
    "csv_roundtrip_ingest",
    # remaining r04-evidence block (all other registered queries were
    # checked in r05): dedup/text/windows/joins/relational/streaming
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
