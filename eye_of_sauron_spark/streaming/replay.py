"""Driver-visible replay of the A11 reorder buffer (reference
src/utils.py:95-191): a deterministic scrambled frame sequence runs
through the REAL streaming operator (file-source micro-batches ->
applyInPandasWithState -> memory sink) and the emitted frames are
returned as a batch DataFrame the DuckDB oracle can check.

What the oracle pins: every synthesized frame is emitted exactly once
with its per-camera rank intact, despite arriving scrambled across 8
micro-batches — a dropped, duplicated, or resurrected frame changes
the emitted set and fails the row/hash compare. The strictly-
increasing-emission-order property (which a batch compare cannot see)
is covered by the property tests in tests/test_properties.py.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..plans.registry import query
from ..sources import load_table
from .harness import (
    file_stream,
    run_to_memory,
    write_microbatch_files_partitioned,
)
from .reorder import reorder_stream

# 64 cameras x up to 200 frames each, derived deterministically from
# the events fixture so both engines can reconstruct the exact frame
# set. The reorder buffer is sized above the per-camera frame cap, so
# the replay is lossless and the oracle is exact (overflow/skip
# semantics are property-tested separately).
_N_CAMERAS = 64
_FRAMES_PER_CAMERA = 200
_N_BATCHES = 8
_BUFFER_SIZE = 256

_REORDER_ORACLE = f"""
    WITH frames AS (
        SELECT CAST(event_id % {_N_CAMERAS} AS INT) AS camera,
               CAST(row_number() OVER (
                   PARTITION BY event_id % {_N_CAMERAS} ORDER BY event_id
               ) - 1 AS INT) AS frame_num
        FROM events
    )
    SELECT camera, frame_num, frame_num + 1 AS emit_rank
    FROM frames WHERE frame_num < {_FRAMES_PER_CAMERA}
"""


def _scrambled_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(camera, frame_num, payload, batch): the deterministic frame
    set with a deterministic md5-derived micro-batch assignment —
    adjacent frames land in different batches, so every camera sees
    out-of-order arrival."""
    ev = load_table(spark, sf_dir, "events")
    cam = (F.col("event_id") % _N_CAMERAS).cast("int")
    frames = ev.select(
        cam.alias("camera"),
        (
            F.row_number().over(
                W.partitionBy(cam).orderBy(F.col("event_id"))
            )
            - 1
        )
        .cast("int")
        .alias("frame_num"),
        F.col("event_type").alias("payload"),
    ).filter(F.col("frame_num") < _FRAMES_PER_CAMERA)
    batch = (
        F.conv(F.substring(F.md5(F.concat_ws(":", "camera", "frame_num")), 1, 4), 16, 10)
        .cast("bigint")
        % _N_BATCHES
    ).cast("int")
    return frames.withColumn("batch", batch)


@query("reorder_replay", oracle=_REORDER_ORACLE)
def reorder_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 end-to-end: scramble -> stream -> stateful reorder -> emit.

    Runs a real Structured Streaming job (availableNow over 8 ordered
    file micro-batches, per-camera applyInPandasWithState) and returns
    (camera, frame_num, emit_rank). Fresh temp input/checkpoint dirs
    and a unique memory-sink name per invocation keep the query
    idempotent and re-runnable within one session.

    Scale shape: state is one small heap per camera, shuffled once on
    the camera key; eviction-on-emit bounds state by disorder, not
    stream length (the reference's heap leaks instead —
    src/utils.py:50,168).
    """
    scrambled = _scrambled_frames(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="reorder_replay_")
    # one job for all 8 batch files (the per-batch filter+write form
    # re-ran the scramble window once per batch)
    write_microbatch_files_partitioned(scrambled, "batch", _N_BATCHES, f"{work}/in")
    stream = file_stream(
        spark, f"{work}/in", "camera INT, frame_num INT, payload STRING"
    )
    # scope the stateful shuffle to the replay's own scale: 64 cameras
    # over 8 state partitions, not the session's 32 — each micro-batch
    # pays per-partition state-store commit + Arrow worker round-trip,
    # so 32 partitions x 8 batches is mostly fixed overhead here. The
    # checkpoint is fresh per invocation, so the partitioning is
    # per-run and nothing else sees the conf (restored immediately).
    conf = spark.conf
    prev = conf.get("spark.sql.shuffle.partitions")
    conf.set("spark.sql.shuffle.partitions", str(_N_BATCHES))
    try:
        emitted = run_to_memory(
            reorder_stream(stream, buffer_size=_BUFFER_SIZE),
            f"reorder_replay_{uuid.uuid4().hex[:8]}",
            f"{work}/ckpt",
        )
    finally:
        conf.set("spark.sql.shuffle.partitions", prev)
    return emitted.select(
        "camera",
        "frame_num",
        F.row_number()
        .over(W.partitionBy("camera").orderBy("frame_num"))
        .alias("emit_rank"),
    )
