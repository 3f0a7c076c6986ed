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

import os
import time

from pyspark.sql import DataFrame, SparkSession


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
