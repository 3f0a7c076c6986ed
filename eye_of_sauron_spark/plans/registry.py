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
    # --- r07 rotation (50 slots) ---
    # 1) the three r06 reds — output schema flattened (ArrayType ->
    # comma-joined string) so the driver canonicalizer can hash them
    "kafka_decode_replay",
    "embedding_centroid_stats",
    "kmeans_lloyd_step",
    # 2) the 13 queries that have NEVER had a driver row (deferred past
    # the r06 cut; VERDICT r06 #2)
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
    # 3) new registrations this round (never driver-checked)
    "stream_reorder_overflow_replay",
    # 4) the r04-stale block (VERDICT r06 #4) — last driver row 3 rounds
    # ago; ml/pipeline.py was touched in r05-r06, so its two lead
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
    # --- the ~50-slot cut lands here (47 above + new regs below) ---
    # 5) r05-stale block re-greens as slots allow; queries whose SOURCE
    # changed since their last row lead it
    "corr_hourly_click_purchase",   # robust.py denominator reworked r07
    "heavy_hitters_users",          # aggregation.py null-key guard r07
    "approx_distinct_users",
    "sketch_quantiles_value",
    "tfidf_top_terms",
    "similarity_topk_cosine",
    "similarity_topk_ivf",
    "dedup_simhash",
    "dedup_cluster_multimodal",
    "reorder_replay",
    "stream_join_replay",
    "stream_dedup_replay",
    "stream_static_match_replay",
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
