"""Query registry: import every plan module so its @query decorators run."""

from . import (  # noqa: F401
    aggregation,
    asof,
    curation,
    decontam,
    dedup,
    grouped,
    preference,
    profiling,
    relational,
    robust,
    scalar,
    skew,
    storage,
    textual,
    timeseries,
    vector,
    warehouse,
    window,
)
from .. import ml  # noqa: F401  (registers ml_* queries)
from .. import operators  # noqa: F401  (registers multimodal_* queries)
from .. import streaming  # noqa: F401  (registers stream_* queries)
from .registry import all_oracles, all_queries, get

__all__ = ["all_queries", "all_oracles", "get"]
