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
    # --- r08 rotation (50 slots) ---
    # 1) queries whose OUTPUT CONTRACT changed this round (the
    # rows-only trio converted to hash-checkable oracles; VERDICT r07
    # #6) — they need fresh driver rows under the new schemas
    "ml_face_pipeline",
    "approx_distinct_users",
    "sketch_quantiles_value",
    "corr_hourly_click_purchase",  # r08 overflow-safe division rework
    # 2) the complete latest-r05 block (VERDICT r07 #2) — no driver
    # row in 2 rounds; after this round nothing is older than r06
    "array_vector_scalars",
    "asof_join_click_before_purchase",
    "binary_base64_codec",
    "conditional_agg_event_matrix",
    "cross_join_region_pairs",
    "cube_quantity",
    "datetime_bucketing",
    "dedup_cluster_multimodal",
    "dedup_simhash",
    "filter_projection_pushdown",
    "grouping_sets_mixed",
    "histogram_value_buckets",
    "interval_join_activity_before_error",
    "json_extract_props",
    "json_map_explode",
    "json_serialize_roundtrip",
    "median_percentiles_value",
    "minmax_by_segment",
    "multi_distinct_by_priority",
    "multimodal_frame_features",
    "multimodal_resize",
    "pack_sequences",
    "pivot_event_counts",
    "reorder_replay",
    "rollup_orders_by_month",
    "setop_except_customers",
    "setop_intersect_nations",
    "setop_union_nations",
    "similarity_topk_cosine",
    "similarity_topk_ivf",
    "split_train_val_test",
    "stats_acctbal_by_nation",
    "stream_dedup_replay",       # also: r07 driver bench showed 1.36x — confirm
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
    "topk_orders_by_price",
    "topk_per_group_orders",
    "unpivot_part_metrics",
    # 3) r06 stragglers with open perf questions (VERDICT r07 #3/#5)
    "similarity_sq8_recall",
    # --- the ~50-slot cut lands here ---
    "stream_funnel_replay",
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
