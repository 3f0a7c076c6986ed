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
    # --- r11 rotation (50 entries = the driver's exact per-round
    # budget, measured: every CORRECTNESS_r02..r10 file holds exactly
    # 50 rows) ---
    # 1) the three r10 registrations with NO driver row yet plus the
    # one query whose latest row predates r08 (VERDICT r10 item 1):
    # these lead unconditionally.
    "search_hybrid_rrf",
    "decontam_semantic_embedding",
    "split_leakage_neardup",
    "window_running_total",
    # 2) NEW this round (VERDICT r10 items 4+6), registered +
    # oracle-certified at three scales + pytest-pinned + benched
    # BEFORE the round's final verification pass (the r09 process
    # rule): SemDeDup cell prune and the linear quality classifier.
    "dedup_semantic_cells",
    "quality_classifier_score",
    # 3) 44 of the 49 queries whose latest driver row is r08 —
    # explicitly including the four r08 streaming replays (VERDICT
    # r10 item 7). After r11, 5 deferrals below are the only rows
    # older than r09; they lead the r12 rotation.
    "approx_distinct_users",
    "array_vector_scalars",
    "asof_join_click_before_purchase",
    "binary_base64_codec",
    "conditional_agg_event_matrix",
    "corr_hourly_click_purchase",
    "cross_join_region_pairs",
    "datetime_bucketing",
    "dedup_cluster_multimodal",
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
    "reorder_replay",
    "rollup_orders_by_month",
    "setop_except_customers",
    "similarity_topk_cosine",
    "similarity_topk_ivf",
    "split_train_val_test",
    "stats_acctbal_by_nation",
    "stream_dedup_replay",
    "stream_join_replay",
    "stream_static_match_replay",
    "string_filename_parse",
    "text_language_id",
    "text_quality_score",
    "text_repetition_score",
    "text_term_stats",
    "text_token_counts",
    "tfidf_top_terms",
    "theta_join_acctbal_dominance",
    "topk_per_group_orders",
    "unpivot_part_metrics",
    # --- deferred to r12 (the 2 new queries above displaced exactly
    # 2 slots; 5 r08 rows remain): each deferral is the
    # lowest-information sibling of a family member that IS in the
    # rotation — shared plan helpers, hash-green r08, re-greened
    # locally in every pytest run (tests/test_queries_oracle.py):
    #   setop_union_nations, setop_intersect_nations (siblings of
    #     setop_except_customers, one relational.py set-op helper),
    #   cube_quantity (sibling of rollup_orders_by_month +
    #     grouping_sets_mixed, one grouped.py helper),
    #   json_map_explode (sibling of json_extract_props +
    #     json_serialize_roundtrip),
    #   topk_orders_by_price (global TakeOrderedAndProject; sibling
    #     of topk_per_group_orders' windowed form).
    # They lead the r12 rotation.
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
