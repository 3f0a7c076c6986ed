"""Micro-batch stream harness over the parquet fixtures.

The reference's source is Kafka (`raw_frame_topic` etc., src/params.py);
this container has no broker, so streams are driven through the file
source — which exercises the identical Structured Streaming machinery
(micro-batches, watermarks, state stores, checkpoints). A file becomes
one micro-batch via ``maxFilesPerTrigger=1`` + ``availableNow``; file
order (the "offset order") is modification-time order, which the
writers below control explicitly.

Swap ``readStream.format("kafka")`` in for production; every
transformation downstream is source-agnostic.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import time
from collections.abc import Callable
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

_CKPT_CHECKSUM_KEY = "spark.sql.streaming.checkpoint.fileChecksum.enabled"


@contextmanager
def ephemeral_checkpoint(spark: SparkSession):
    """Scope-disable per-file checkpoint checksums (Spark 4.1 default:
    every offset/commit/state-delta write also writes a checksum
    companion file through a 2-thread handoff pool). The integrity
    feature exists to detect corruption in LONG-LIVED checkpoints on
    remote storage; the replay harness's checkpoints are per-invocation
    temp dirs deleted seconds after the drain, so the companion writes
    are pure fixed cost — ~10% of an 8-batch replay's wall, measured
    (SCALE.md "Replay-family fixed-wall profile, round 15"). The
    session default stays untouched for any long-lived stream a user
    starts. Restored on exit; reads of mixed checkpoints remain valid
    either way (skipCreationIfFileMissingChecksum defaults true).

    SERIAL-ONLY, same contract as replay._scoped_shuffle: the conf is
    session-wide while the drain runs."""
    prev = spark.conf.get(_CKPT_CHECKSUM_KEY, None)
    spark.conf.set(_CKPT_CHECKSUM_KEY, "false")
    try:
        yield
    finally:
        if prev is not None:
            spark.conf.set(_CKPT_CHECKSUM_KEY, prev)
        else:
            spark.conf.unset(_CKPT_CHECKSUM_KEY)


def write_microbatch_files(
    spark: SparkSession, batches: list[DataFrame], out_dir: str
) -> None:
    """Write each DataFrame as one parquet file in ``out_dir``, with
    strictly increasing modification times so the file source replays
    them as ordered micro-batches."""
    os.makedirs(out_dir, exist_ok=True)
    base = time.time() - 3600
    for i, df in enumerate(batches):
        part_dir = os.path.join(out_dir, f"_stage_{i}")
        df.coalesce(1).write.mode("overwrite").parquet(part_dir)
        src = next(
            f for f in os.listdir(part_dir) if f.endswith(".parquet")
        )
        dst = os.path.join(out_dir, f"batch_{i:04d}.parquet")
        os.replace(os.path.join(part_dir, src), dst)
        os.utime(dst, (base + i, base + i))
        # clean the staging dir
        for f in os.listdir(part_dir):
            os.remove(os.path.join(part_dir, f))
        os.rmdir(part_dir)


def write_microbatch_files_partitioned(
    df: DataFrame, batch_col: str, n_batches: int, out_dir: str
) -> None:
    """Same contract as ``write_microbatch_files`` — one parquet file
    per micro-batch, modification times increasing in batch order —
    but written in ONE Spark job: the source DataFrame is hash-
    partitioned on the batch column and written with ``partitionBy``,
    then the per-batch files are moved into place. ``n_batches``
    separate filter+write jobs re-run the upstream plan once per
    batch (the replay's scramble window made that 8x a full window
    over events)."""
    os.makedirs(out_dir, exist_ok=True)
    stage = os.path.join(out_dir, "_stage")
    (
        df.repartition(n_batches, batch_col)
        .write.mode("overwrite")
        .partitionBy(batch_col)
        .parquet(stage)
    )
    base = time.time() - 3600
    for i in range(n_batches):
        pdir = os.path.join(stage, f"{batch_col}={i}")
        # a batch value with zero rows writes no partition dir (e.g.
        # _time_sliced octiles on a skewed timestamp distribution);
        # skip it — an absent file is an empty micro-batch, and the
        # remaining files keep their mtime ordering
        if not os.path.isdir(pdir):
            continue
        files = sorted(f for f in os.listdir(pdir) if f.endswith(".parquet"))
        # hash partitioning puts all rows of one batch value in one
        # task, so each partition dir holds exactly one file
        assert len(files) == 1, (pdir, files)
        dst = os.path.join(out_dir, f"batch_{i:04d}.parquet")
        os.replace(os.path.join(pdir, files[0]), dst)
        os.utime(dst, (base + i, base + i))
    shutil.rmtree(stage)


# Session-scoped cache of synthesized micro-batch logs. The replay
# family stands in for a Kafka broker; a broker's log exists ONCE and
# every consumer reads it — re-materializing an identical log per
# consumer query measured the harness, not the engine (each staging
# write is a full scan + repartition + parquet job). Keyed by the
# log's identity (fixture dir + slicing recipe); consumers read the
# staged files strictly read-only (their own work dirs hold only
# checkpoints), and the file source's explicit schema projects each
# consumer's column subset out of the shared superset file. The value
# records the batch-file set written at staging time: an absent batch
# file is BY DESIGN an empty micro-batch, so a bare isdir() hit check
# could not tell "empty batch" from "a /tmp reaper deleted staged
# files mid-process" and would silently serve a truncated log — the
# hit path re-validates the recorded set and rebuilds on any miss
# (r14 ADVICE).
_STAGED_LOGS: dict[tuple, tuple[str, frozenset[str]]] = {}


def staged_microbatch_log(
    key: tuple, n_batches: int, build: Callable[[], DataFrame]
) -> str:
    """Return the directory of a staged micro-batch log, writing it on
    first use (one ``write_microbatch_files_partitioned`` job) and
    serving every later request from the cache. ``key`` must capture
    everything the log's contents depend on (fixture dir, slicing
    recipe, batch count). Callers must treat the returned directory as
    read-only; it is removed at process exit, never by a query. A
    cache hit is served only if every batch file recorded at write
    time is still present — otherwise the log is restaged."""
    hit = _STAGED_LOGS.get(key)
    if hit is not None:
        path, expected = hit
        if os.path.isdir(path) and all(
            os.path.isfile(os.path.join(path, f)) for f in expected
        ):
            return path
    path = tempfile.mkdtemp(prefix="staged_log_")
    write_microbatch_files_partitioned(build(), "batch", n_batches, path)
    written = frozenset(
        f for f in os.listdir(path) if f.endswith(".parquet")
    )
    _STAGED_LOGS[key] = (path, written)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def file_stream(spark: SparkSession, src_dir: str, schema) -> DataFrame:
    """One file per micro-batch, in modification-time order."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src_dir)
    )


def run_to_memory(
    stream_df: DataFrame,
    name: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> DataFrame:
    """Drain the stream with an availableNow trigger into a memory
    sink and return the sink's contents as a DataFrame."""
    with ephemeral_checkpoint(stream_df.sparkSession):
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return stream_df.sparkSession.table(name)
