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
# all_queries()/all_oracles() so queries that have never appeared in a
# CORRECTNESS_r*.json get driver evidence before already-green ones
# rotate back in. Unlisted names follow in registration order.
# (r02 gap: 21 of 71 queries had no driver row at all — VERDICT.md #1.)
_VERIFY_FIRST: tuple[str, ...] = (
    # never driver-checked through r02
    "similarity_topk_cosine",
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "stream_tumbling_window",
    "stream_sliding_window",
    "stream_session_window",
    "multimodal_image_stats",
    "multimodal_frame_sample",
    "ml_match_first_target",
    "ml_face_pipeline",
    "doc_fingerprint",
    "text_pii_scrub",
    "deterministic_sample_documents",
    "text_chunking",
    # green in r01 only; absent from r02's 50-entry file
    "window_rank_customers",
    "window_running_total",
    "window_lag_event_gaps",
    "window_moving_avg",
    "window_lead_transitions",
    "window_ntile_spend_quartiles",
    "window_first_match_semantics",
    # errored in r02 (array<double> canonicalizer crash), fixed this round
    "sketch_quantiles_value",
    # new in round 3
    "reorder_replay",
    "stream_change_detect",
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
