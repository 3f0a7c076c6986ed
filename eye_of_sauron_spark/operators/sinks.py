"""Batch sinks: partitioned and per-key-routed parquet writers.

The reference's sinks are Kafka topics — one per camera for results
(``predicted_..._{cam}``, src/params.py:17, prediction_producer.py:
269-271) — plus Flask-served image blobs. This container has no
broker, so the batch sinks materialize the same layouts on files;
the streaming analogs (foreachBatch, memory, checkpointed routed
sink) live in streaming/pipeline.py and streaming/harness.py.

Scale notes: ``partitionBy`` writes one directory per key value and
enables partition pruning on read-back — the file-side equivalent of
per-key topics. ``repartition(keys)`` before the write keeps one
writer task per key-partition instead of every task opening every
partition's file (the small-files explosion at 1000 executors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, keys: list[str], mode: str = "overwrite"
) -> None:
    """Key-partitioned parquet layout (one dir per key value), with a
    pre-shuffle on the keys so each output partition is written by
    one task — bounded file counts at any executor count."""
    df.repartition(*keys).write.mode(mode).partitionBy(*keys).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Bucketed managed table: rows are hash-bucketed (and optionally
    sorted) on the join key at WRITE time, so equi-joins and
    aggregations on that key later run with NO exchange — the
    pay-once co-location strategy for fact tables that are joined on
    the same key by every query. Verified in tests: a join of two
    same-bucketed tables plans without a shuffle."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)
