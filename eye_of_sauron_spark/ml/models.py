"""Deterministic stub inference models behind Arrow-vectorized UDFs.

The reference's ML surface is dlib via ``face_recognition`` plus cv2
rendering, called row-at-a-time inside consumer loops:

- detect: ``face_recognition.face_locations`` -> (n, 4) int boxes
  (src/prediction_producer.py:151)
- embed: ``face_recognition.face_encodings`` -> (n, 128) float64
  (src/prediction_producer.py:155)
- annotate: cv2 rectangles + labels re-serialized to a tensor triple
  (src/prediction_producer.py:328-350)

Those libraries are not in this container, so each model is a
DETERMINISTIC FAKE: outputs are pure functions of the input bytes
(crc32-seeded), stable across runs, processes, and partitions. The
Spark-side contract — BinaryType in, nested-array out, Arrow batch
transfer, schema, null handling — is the real thing; swapping in the
real models is replacing the body of one numpy function.

Scale notes: all three run as ``pandas_udf`` / ``mapInPandas`` over
Arrow record batches — the per-batch Python cost is amortized over
thousands of rows, versus the reference's per-message Python loop.
Model weights (here: none) would ship via broadcast, loaded once per
executor in the UDF's init path, never per row.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd

EMBED_DIM = 64  # matches the embeddings fixture; reference uses 128
MAX_FACES = 3


def _rng(payload: bytes, salt: int) -> np.random.RandomState:
    return np.random.RandomState((zlib.crc32(payload) ^ salt) & 0x7FFFFFFF)


def detect_faces_np(payload: bytes) -> list[list[int]]:
    """Stub ``face_locations``: 0..MAX_FACES-1 boxes (top, right,
    bottom, left), derived from the image bytes."""
    if payload is None or len(payload) == 0:
        return []
    rng = _rng(payload, 0xD37EC7)
    n = int(payload[0]) % MAX_FACES
    boxes = []
    for _ in range(n):
        top, left = int(rng.randint(0, 200)), int(rng.randint(0, 200))
        size = int(rng.randint(20, 80))
        boxes.append([top, left + size, top + size, left])
    return boxes


def embed_faces_np(payload: bytes, boxes: list[list[int]]) -> list[list[float]]:
    """Stub ``face_encodings``: one EMBED_DIM vector per box, a pure
    function of (image bytes, box) so identical crops embed
    identically — which is what lets the exact-match tests assert
    dist == 0 for targets cut from the same frame."""
    out = []
    for box in boxes:
        rng = _rng(payload, zlib.crc32(bytes(b % 256 for b in box)))
        out.append([float(v) for v in rng.uniform(0.0, 1.0, EMBED_DIM)])
    return out


def annotate_np(payload: bytes, boxes: list[list[int]], names: list[str]) -> bytes:
    """Stub cv2 annotate: prepend a deterministic render header
    (box count + labels) to the original bytes — same shape as the
    reference's re-serialized ``predicted_*`` tensor triple."""
    header = ";".join(
        f"{n or 'Unknown'}@{t},{r},{b},{le}" for (t, r, b, le), n in zip(boxes, names)
    )
    return b"ANNOT[" + header.encode() + b"]" + (payload or b"")


def detect_series(images: pd.Series) -> pd.Series:
    return images.map(detect_faces_np)


def embed_series(images: pd.Series, boxes: pd.Series) -> pd.Series:
    return pd.Series(
        [embed_faces_np(img, bx) for img, bx in zip(images, boxes)], index=images.index
    )


def make_embed_udf(weights_broadcast):
    """Factory for a weight-parameterized embed UDF — the production
    pattern for model parameters: the driver broadcasts them once
    (``spark.sparkContext.broadcast``), every executor deserializes
    once, and the Arrow-batched UDF reads ``.value`` per batch — vs
    the reference shipping the model implicitly via process fork
    (run_consumers.py) and the query faces via a Kafka topic
    (prediction_producer.py:222-228).

    ``weights_broadcast.value`` must be a dict with ``scale`` (float)
    and ``bias`` (float) applied element-wise to the stub embedding.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, FloatType

    @pandas_udf(ArrayType(FloatType()))
    def embed_with_weights(images: pd.Series, boxes: pd.Series) -> pd.Series:
        w = weights_broadcast.value  # deserialized once per executor
        s, b = float(w["scale"]), float(w["bias"])
        out = []
        for img, bx in zip(images, boxes):
            if bx is None:
                out.append(None)
                continue
            e = embed_faces_np(img, [list(bx)])[0]
            out.append([v * s + b for v in e])
        return pd.Series(out, index=images.index)

    return embed_with_weights
