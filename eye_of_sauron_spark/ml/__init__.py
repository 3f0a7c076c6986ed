"""ML-inference surface: deterministic stub models (models.py) and the
detect -> embed -> broadcast-match -> annotate pipeline (pipeline.py),
reference A4-A7 re-expressed as Arrow-UDF DataFrame stages."""

from . import pipeline  # noqa: F401  (registers ml_* queries)
from .models import EMBED_DIM, annotate_np, detect_faces_np, embed_faces_np

__all__ = ["EMBED_DIM", "annotate_np", "detect_faces_np", "embed_faces_np", "pipeline"]
