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
    # --- r14 rotation (50 entries = the driver's measured per-round
    # budget) ---
    # BASIS (permanent rule, VERDICT r13 #1): this list is generated
    # from `python tools/evidence_ledger.py` over the CORRECTNESS_r*.json
    # files PRESENT AT ROUND START — never from the prior round's
    # expected outcome. At r14 start the artifacts on disk are
    # CORRECTNESS_r01..r11 and r13 (NO r12 — that driver round's
    # artifacts never landed), so the ledger reads: 50 r13 / 50 r11 /
    # 16 r10 / 43 r09 / 5 r08 / 2 never-verified. The r13 comment's
    # promise that "the 16 r10 deferrals lead r14" was written against
    # an assumed r12 outcome and is superseded by this basis: r10 rows
    # are FRESHER than the r09/r08 blocks and wait for r15.
    # 1) the 2 registered queries with NO driver row at all (their r12
    # slots were lost with the missing artifacts). They lead
    # unconditionally.
    "dedup_minhash_recall",
    "stream_change_detect_replay",
    # 2) the 5 rows whose latest driver evidence is r08 — five rounds
    # stale, ordered re-greened since the r11 brief.
    "cube_quantity",
    "json_map_explode",
    "setop_intersect_nations",
    "setop_union_nations",
    "topk_orders_by_price",
    # 3) NEW this round (the r14 surface cap is 2, VERDICT r13 #2):
    # the Lloyd-trained PQ tier and its recall contract — the trained
    # codebooks lift the quality ledger's weakest rung (seed PQ ~0.5 ->
    # trained ~0.7 on the worst-case isotropic fixture) using only
    # driver-green machinery (kmeans_lloyd_step's assignment/update
    # conventions inside similarity_topk_pq_rerank's plan shape).
    "similarity_topk_pq_trained",
    "similarity_pq_trained_recall",
    # 4) 41 of the 43 rows whose latest driver evidence is r09. The 2
    # deferrals (below) are the only rows this rotation leaves at r09.
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
    # --- deferred to r15 (each with rationale; all re-greened locally
    # in every pytest run, tests/test_queries_oracle.py):
    #   similarity_lsh_recall, similarity_sq8_recall (r09) — the two
    #     new trained-PQ rows displaced exactly these two: the recall-
    #     contract harness (_recall_of/_recall_oracle) is exercised
    #     THREE times in this rotation (dedup_minhash_recall,
    #     similarity_ivf_recall, similarity_pq_trained_recall), and
    #     their forward paths similarity_topk_lsh /
    #     similarity_topk_sq8_rerank are r13-fresh; similarity_ivf_recall
    #     stays in because its forward path (similarity_topk_ivf, r11)
    #     is the family's oldest.
    #   the 16 r10 rows (window_lag_event_gaps, window_lead_transitions,
    #     window_moving_avg, window_ntile_spend_quartiles,
    #     window_rank_customers, stream_tumbling_window,
    #     stream_sliding_window, dedup_exact_keep_first,
    #     multimodal_frame_sample, sql_revenue_top_nations,
    #     jsonl_roundtrip_ingest, deterministic_sample_documents,
    #     zorder_cluster_events, funnel_view_click_purchase,
    #     semi_join_active_customers, heavy_hitters_users) — fresher
    #     than every block in this rotation; per-name family rationales
    #     recorded in the r13 rotation comment (git history, commit
    #     492b27e^). With the 2 r09 deferrals they are the natural r15
    #     head: 16 + 2 + 50-r13-block overflow as needed.
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
