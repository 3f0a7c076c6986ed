"""SparkSession factory.

Local testing runs a single JVM (``local[N]``); the configs below are
chosen so the *same logical plans* scale to a multi-executor cluster:

- AQE on (runtime coalescing, skew-join splitting) so shuffle partition
  counts self-tune between sf0.001 local runs and 100 TB cluster runs.
- Arrow on for every pandas-UDF boundary (the ML-inference path).
- UTC session timezone so timestamp semantics match the DuckDB oracle
  (DuckDB timestamps are UTC-naive).
- Shuffle partitions default to core count locally; on a real cluster
  AQE's coalescing makes the initial number mostly irrelevant as long
  as it is high enough — set ``spark.sql.shuffle.partitions`` to
  2-3x total cores via ``extra_conf`` there.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def get_spark(
    app_name: str = "eye_of_sauron_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
    state_store: str = "hdfs",
) -> SparkSession:
    """Build (or fetch) the session with scale-aware defaults.

    ``state_store``: ``"hdfs"`` (default — executor-heap
    HDFSBackedStateStoreProvider) or ``"rocksdb"`` (off-heap local
    RocksDB + changelog). The default heap provider holds EVERY
    stateful operator's keys in executor memory — fine at test scale,
    but the 10x stream-dedup probe already measures 348 MB of heap
    state (SCALE.md), which at 100x is multi-GB per executor and
    evicts the working set. RocksDB keeps state on local SSD with a
    block-cache, so state capacity scales with disk, not heap — the
    standard choice for large-state production streams. Results are
    provider-independent (pinned by tests/test_round9_ops.py); it is
    a runtime SQL conf, so it can also be flipped per-query before
    ``start()`` on an existing session.

    StateStore conf ownership is per-call: every ``get_spark`` call
    (re)applies ``state_store`` + ``extra_conf`` to the live session,
    so a plain call resets any custom provider an earlier call wired
    through ``extra_conf`` — re-pass it on each call to keep it."""
    cpus = _DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # runtime row-level join pruning: inject a bloom filter from the
        # filtered small side into the big side's scan — at 100 TB this
        # skips reading fact rows that can never join
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 rejects
        # outright (PARQUET_TYPE_ILLEGAL); read nanos as int64 once,
        # session-wide, so no table loader has to flip configs mid-query
        # (the loader truncates ns -> us to match DuckDB's reader).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # the fixtures carry tz-naive TIMESTAMP(MICROS); read them as
        # plain TIMESTAMP (interpreted in the UTC session zone) rather
        # than TIMESTAMP_NTZ so epoch math (unix_micros etc.) and the
        # UTC-naive DuckDB oracle see identical instants
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # parquet scans: vectorized reader + pushdown are on by default;
        # keep files from fragmenting into too many tiny tasks locally.
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.ui.enabled", "false")
    )
    if SparkSession.getActiveSession() is None:
        # only effective before the JVM exists; setting it on a live
        # session would silently do nothing, so don't pretend otherwise
        builder = builder.config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
        )
    if state_store == "rocksdb":
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass", _ROCKSDB_PROVIDER
        ).config(
            # changelog checkpointing ships per-batch deltas instead of
            # full RocksDB snapshots — the commit path stays O(changed
            # keys) as total state grows
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
    elif state_store != "hdfs":
        raise ValueError(f"state_store must be 'hdfs' or 'rocksdb', got {state_store!r}")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate silently ignores builder configs when a session
    # already exists in the JVM, which would leave a caller that
    # flipped state_store mid-process on the other provider with no
    # error — in EITHER direction (heap session + rocksdb request, or
    # rocksdb session + default-heap request). Both stateStore confs
    # are runtime SQL confs read at stream start, so setting/unsetting
    # them on the live session is always honored (and idempotent on a
    # fresh one).
    if state_store == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", _ROCKSDB_PROVIDER
        )
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
    else:
        for key in (
            "spark.sql.streaming.stateStore.providerClass",
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        ):
            # provider ownership is PER-CALL: each get_spark call fully
            # determines the stateStore confs for the session it
            # returns. THIS call's extra_conf may pin the keys; a later
            # plain get_spark() on the live session deliberately resets
            # them to the default heap provider — callers who want a
            # custom provider to persist across get_spark calls must
            # pass it in extra_conf on every call (or set it directly
            # on spark.conf after the last get_spark).
            if not (extra_conf and key in extra_conf):
                spark.conf.unset(key)
    spark.sparkContext.setLogLevel("WARN")
    return spark
