"""Composite dataflow operators that aren't pure relational plans:
multimodal binary-column codecs/sampling (multimodal.py) and batch
sink writers (sinks.py)."""

from . import multimodal  # noqa: F401  (registers multimodal_* queries)
from . import sinks  # noqa: F401

__all__ = ["multimodal", "sinks"]
