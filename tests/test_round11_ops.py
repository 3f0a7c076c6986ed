"""Round-11 additions: ADVICE fixes + the two new operators.

Covers
- session.py: default/heap request now unsets a live session's
  RocksDB provider (the reverse direction of the r10 fix).
- streaming/replay.py: listener drain dedupes re-executed batches.
- plans/dedup.py: `dedup_semantic_cells` (SemDeDup-style
  cluster-then-prune) — plan pins zero cross-cell pairs.
- plans/curation.py: `quality_classifier_score` — broadcast linear
  classifier over hashed token features, no shuffle beyond the scan.
"""

from __future__ import annotations

import pytest


def test_get_spark_heap_unsets_rocksdb_on_existing_session(spark):
    """The r10 fix was one-directional: a rocksdb request overrides a
    live heap session, but a default/heap request on a process whose
    session was created with rocksdb silently kept the RocksDB
    provider (r10 ADVICE, session.py). Both directions must now be
    honored on the live session."""
    from eye_of_sauron_spark.session import _ROCKSDB_PROVIDER, get_spark

    key = "spark.sql.streaming.stateStore.providerClass"
    changelog = (
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    )
    default = spark.conf.get(key)
    assert "RocksDB" not in default
    try:
        same = get_spark(state_store="rocksdb")
        assert same is spark
        assert spark.conf.get(key) == _ROCKSDB_PROVIDER
        # now the reverse direction: a default-store request must not
        # silently keep the RocksDB provider
        same = get_spark()  # state_store="hdfs" default
        assert same is spark
        assert spark.conf.get(key) == default
        assert spark.conf.get(changelog, None) in (None, "false")
    finally:
        spark.conf.set(key, default)
        spark.conf.unset(changelog)


def test_metrics_listener_dedupes_retried_batches():
    """A micro-batch re-executed after checkpoint recovery emits a
    second progress event for the same batch_id; the drain must keep
    the latest event per id so `seen` is not over-counted and no
    duplicate per-batch rows are emitted (r10 ADVICE, replay.py)."""
    from eye_of_sauron_spark.streaming.metrics import latest_by_batch

    events = [
        {"batch_id": 0, "observed": {"n_rows": 10}},
        {"batch_id": 1, "observed": {"n_rows": 7}},
        # retry of batch 1 after recovery — supersedes the first event
        {"batch_id": 1, "observed": {"n_rows": 7, "retried": True}},
        {"batch_id": 2, "observed": None},  # empty flush batch
    ]
    out = latest_by_batch(events)
    assert [b["batch_id"] for b in out] == [0, 1, 2]
    assert out[1]["observed"].get("retried") is True
    seen = sum(
        b["observed"]["n_rows"] for b in out if b["observed"] is not None
    )
    assert seen == 17  # not 24


def test_bm25_postings_memo_shares_and_evicts(spark, sf_dir):
    """_bm25_per_doc's localCheckpoint runs a job at construction and
    pins executor storage; the one-slot memo must (a) hand BOTH
    retrieval queries the SAME materialization for a given corpus and
    (b) unpersist the previous corpus's blocks on eviction
    (r10 ADVICE, textual.py)."""
    from eye_of_sauron_spark.plans import textual

    textual._BM25_POSTINGS_MEMO.clear()
    df1 = textual._bm25_per_doc(spark, sf_dir)
    assert len(textual._BM25_POSTINGS_MEMO) == 1
    (ck1, ids1) = next(iter(textual._BM25_POSTINGS_MEMO.values()))
    assert ids1, "checkpoint should register persistent RDD blocks"
    df2 = textual._bm25_per_doc(spark, sf_dir)
    # same corpus -> same checkpointed relation object, no second job
    assert next(iter(textual._BM25_POSTINGS_MEMO.values()))[0] is ck1
    assert sorted(map(tuple, df1.collect())) == sorted(map(tuple, df2.collect()))
    # different memo key -> previous blocks evicted + unpersisted
    textual._bm25_postings_shared(
        spark,
        ck1.limit(1),
        (spark.sparkContext.applicationId, sf_dir + "#other"),
    )
    live = {
        int(i)
        for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }
    assert not (live & set(ids1)), "evicted postings blocks still persisted"
    textual._BM25_POSTINGS_MEMO.clear()
