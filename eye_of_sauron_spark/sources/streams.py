"""Streaming source builders: kafka / rate / file.

The reference consumes Kafka topics partition-by-partition with
manual assignors (src/prediction_producer.py:64-66, 94-118); in
Structured Streaming the same ingestion is one ``readStream`` whose
partition->task mapping, offset tracking, and rebalance are handled
by the engine. No broker ships in this container, so ``kafka_stream``
is a configuration builder (exercised in production, not here); the
rate and file sources drive every local test through the identical
micro-batch machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming.harness import file_stream  # noqa: F401  (re-export)


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topics: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka ingestion (reference raw_frame_topic analog). Requires
    the spark-sql-kafka connector on the classpath; the returned
    stream carries (key, value BinaryType, topic, partition, offset,
    timestamp) — decode ``value`` downstream."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def rate_stream(
    spark: SparkSession, rows_per_second: int = 100, num_partitions: int = 4
) -> DataFrame:
    """Wall-clock rate source — load/soak harness."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", num_partitions)
        .load()
    )


def rate_micro_batch_stream(
    spark: SparkSession, rows_per_batch: int = 100, num_partitions: int = 4
) -> DataFrame:
    """Deterministic rate source: exactly ``rows_per_batch`` rows per
    micro-batch — reproducible streaming tests without wall-clock
    dependence."""
    return (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("numPartitions", num_partitions)
        .load()
    )
