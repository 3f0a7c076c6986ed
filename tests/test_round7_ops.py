"""Round-7 additions: the reorder buffer's degenerate-path replay,
flattened (scalar-only) output schemas for the former ArrayType
queries, and the corr/heavy-hitters edge-case contracts."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from _oracle import compare, duckdb_con
from eye_of_sauron_spark.plans.registry import get

SF = "/root/testdata/sf0.001"

# Driver-hashable output types: the external harness canonicalizes via
# pandas sort_values, which cannot order list/struct/map cells.
_SCALAR_TYPES = {
    "string", "integer", "long", "double", "float", "boolean",
    "timestamp", "timestamp_ntz", "date", "short", "byte",
}


def _assert_scalar_schema(df):
    bad = [
        f"{f.name}:{f.dataType.typeName()}"
        for f in df.schema.fields
        if f.dataType.typeName() not in _SCALAR_TYPES
        and not f.dataType.typeName().startswith("decimal")
    ]
    assert not bad, f"non-scalar output columns (driver cannot hash): {bad}"


def test_reorder_overflow_replay_matches_oracle(spark):
    q = get("stream_reorder_overflow_replay")
    df = q.fn(spark, SF)
    _assert_scalar_schema(df)
    compare(df, duckdb_con(SF), q.oracle)


def test_reorder_overflow_drops_late_and_lost_frames(spark):
    out = get("stream_reorder_overflow_replay").fn(spark, SF).toPandas()
    emitted = set(out[out["camera"] == 0]["frame_num"])
    assert 50 not in emitted          # arrived late, after the skip
    assert 120 not in emitted         # never arrived
    assert emitted == set(range(200)) - {50, 120}
    # per-camera emission is dup-free
    assert not out.duplicated(["camera", "frame_num"]).any()


def test_centroid_and_kmeans_schemas_are_scalar(spark):
    # the r06 reds: ArrayType centroid_micro broke the driver hash
    for name in ("embedding_centroid_stats", "kmeans_lloyd_step"):
        _assert_scalar_schema(get(name).fn(spark, SF))


def test_centroid_stats_matches_oracle(spark):
    q = get("embedding_centroid_stats")
    compare(q.fn(spark, SF), duckdb_con(SF), q.oracle)


def test_corr_constant_series_yields_null_on_both_engines(spark, tmp_path):
    """vx = 0 (no clicks at all) must produce NULL r2_ppm on BOTH
    engines, not Spark-NULL-vs-DuckDB-division-error."""
    src = duckdb.connect()
    src.execute(
        f"""
        COPY (
            SELECT event_id, user_id,
                   'purchase' AS event_type,   -- constant: zero clicks
                   value, ts
            FROM read_parquet('{SF}/events.parquet')
        ) TO '{tmp_path}/events.parquet' (FORMAT PARQUET)
        """
    )
    q = get("corr_hourly_click_purchase")
    got = q.fn(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    want = con.sql(q.oracle).fetchdf()
    assert pd.isna(got["r2_ppm"].iloc[0])
    assert pd.isna(want["r2_ppm"].iloc[0])
    assert int(got["sign"].iloc[0]) == int(want["sign"].iloc[0]) == 0


def test_cdc_apply_reads_only_touched_buckets(spark, tmp_path):
    """The bucket-pruning contract of the CDC apply sink, asserted on
    RECORDED READ PATHS (not wall-clock): after a batch that touches a
    single bucket, only that bucket's latest generation is read, and
    untouched buckets are never rewritten past their last touch."""
    import datetime as dt

    import pyspark.sql.functions as F

    from eye_of_sauron_spark.streaming.harness import (
        file_stream,
        write_microbatch_files_partitioned,
    )
    from eye_of_sauron_spark.streaming.replay import _CDC_BUCKETS, make_cdc_apply

    # one user per hash bucket (Spark's pmod(hash(user_id), 8))
    per_bucket = {}
    for r in (
        spark.range(0, 64)
        .select(
            F.col("id").alias("user_id"),
            F.pmod(F.hash(F.col("id")), F.lit(_CDC_BUCKETS)).alias("bucket"),
        )
        .collect()
    ):
        per_bucket.setdefault(int(r.bucket), int(r.user_id))
    assert len(per_bucket) == _CDC_BUCKETS
    hot_bucket = sorted(per_bucket)[3]
    hot_user = per_bucket[hot_bucket]

    t0 = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for b in sorted(per_bucket):  # batch 0 seeds every bucket
        rows.append((per_bucket[b], "view", 1.0, t0, eid, 0))
        eid += 1
    for batch in (1, 2, 3):  # later batches touch ONE bucket
        rows.append(
            (hot_user, "click", float(batch),
             t0 + dt.timedelta(minutes=batch), eid, batch)
        )
        eid += 1
    df = spark.createDataFrame(
        rows,
        "user_id BIGINT, event_type STRING, value DOUBLE, ts TIMESTAMP,"
        " event_id BIGINT, batch INT",
    )
    work = str(tmp_path)
    write_microbatch_files_partitioned(df, "batch", 4, f"{work}/in")
    stream = file_stream(
        spark,
        f"{work}/in",
        "user_id BIGINT, event_type STRING, value DOUBLE, ts TIMESTAMP,"
        " event_id BIGINT",
    )
    hist: dict[int, list[tuple[int, str]]] = {}
    read_log: list[tuple[int, list[tuple[int, str]]]] = []
    q = (
        stream.writeStream.foreachBatch(make_cdc_apply(work, hist, read_log))
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    by_epoch = dict(read_log)
    assert by_epoch[0] == []  # cold start: nothing to read
    for ep in (1, 2, 3):
        reads = by_epoch[ep]
        # ONLY the touched bucket's generation is opened...
        assert [b for b, _ in reads] == [hot_bucket], (ep, reads)
        # ...and it is the PREVIOUS epoch's generation of that bucket
        assert reads[0][1] == f"{work}/snap/gen={ep - 1}/bucket={hot_bucket}"
    # untouched buckets were never rewritten after their batch-0 seed
    for b, h in hist.items():
        expected = [0, 1, 2, 3] if b == hot_bucket else [0]
        assert [ep for ep, _ in h] == expected, (b, h)
    # and the merged hot slice is correct: last-writer-wins + op count
    final = spark.read.parquet(hist[hot_bucket][-1][1]).toPandas()
    hot = final[final["user_id"] == hot_user].iloc[0]
    assert hot["event_type"] == "click"
    assert hot["value"] == 3.0
    assert hot["n_ops"] == 4


def test_heavy_hitters_ignores_null_user_ids(spark, tmp_path):
    """NULL keys are excluded by stated contract on both sides — plant
    a NULL-heavy events table and check neither engine reports the
    NULL group."""
    src = duckdb.connect()
    src.execute(
        f"""
        COPY (
            SELECT event_id,
                   CASE WHEN event_id % 2 = 0 THEN NULL ELSE user_id END
                       AS user_id,
                   event_type, value, ts
            FROM read_parquet('{SF}/events.parquet')
        ) TO '{tmp_path}/events.parquet' (FORMAT PARQUET)
        """
    )
    q = get("heavy_hitters_users")
    got = q.fn(spark, str(tmp_path)).toPandas()
    assert not got["user_id"].isna().any()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    want = con.sql(q.oracle).fetchdf()
    assert not want["user_id"].isna().any()
    got_s = got.sort_values(["user_id"]).reset_index(drop=True)
    want_s = want.sort_values(["user_id"]).reset_index(drop=True)
    assert got_s["user_id"].tolist() == want_s["user_id"].tolist()
    assert got_s["n_events"].tolist() == want_s["n_events"].tolist()
