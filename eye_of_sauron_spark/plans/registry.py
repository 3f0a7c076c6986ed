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
    # --- r09 rotation (50 entries, exactly filling the ~50-slot
    # driver budget) ---
    # 1) NEW this round — no driver row yet: the bucketed stateful
    # funnel (per-group-tax mitigation, VERDICT r08 #1) and the
    # per-document duplicated-span coverage operator
    "stream_funnel_bucketed_replay",
    "dedup_span_coverage",
    "dedup_span_rewrite",
    "stream_late_drop_replay",
    # 2) the complete latest-r06 block (VERDICT r08 #2) — after this
    # round no query's evidence predates r07. Includes the
    # similarity_*_recall family whose bench creep r08 flagged.
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
    "dedup_ngram_jaccard",
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
    "similarity_topk_lsh",
    "similarity_topk_sq8_rerank",
    "skyline_pareto_orders",
    "stream_cdc_apply_replay",
    "stream_funnel_replay",
    "stream_left_join_replay",
    "stream_rebroadcast_replay",
    "stream_restart_replay",
    "stream_session_replay",
    "stream_update_mode_replay",
    "stream_window_replay",
    "text_bigram_lm",
    "text_char_diversity",
    "text_lm_score",
    "textrank_keywords",
    "timeseries_gap_fill",
    "timeseries_ohlc_resample",
    "validate_events_expectations",
    "window_percent_rank_acctbal",
    "winsorize_values_by_type",
    # 3) r09 code change needing a fresh row (small-group clamp)
    "sketch_quantiles_value",
    # zorder_cluster_events was cut when the r09 operators took its
    # slot: its r08 1.81x flag resolved as single-run noise
    # (BENCH_LOCAL_r09 3-run median 0.335 s, back at r06 level), its
    # last driver row is hash-green r07, and nothing in its code
    # changed — it needs no fresh evidence, the new operators do.
    # For the r10 rotation: stream_dedup_replay (r08 hash-green, not
    # in this list) measured 3.42 s median-of-3 vs 5.60 s best-of-2
    # across the two r09 local bench records — re-measure alongside
    # the usual freshness block.
    # --- stretch slot #51: past the nominal ~50 budget. The 50
    # priority slots above are exactly consumed (4 new + the 45-query
    # freshness block + the changed sketch contract); this runs only
    # if the driver's budget stretches, else it LEADS the r10
    # rotation. Local evidence meanwhile: hash-green at sf0.001 +
    # sf0.01, pruning pinned by pytest.
    "routed_sink_pruned_read",
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
