"""Query registry: import every plan module so its @query decorators run."""

from . import aggregation, dedup, relational, scalar, window  # noqa: F401
from .registry import all_oracles, all_queries, get

__all__ = ["all_queries", "all_oracles", "get"]
