"""Robust statistics: winsorization and z-score anomaly detection.

Outlier handling is the data-cleaning stage every metrics/training
pipeline runs before aggregation: clip the tails (winsorize) or flag
the points far from the per-group mean (z-score). Both are built to
hash bit-identically against the DuckDB oracle:

- winsorization picks the value AT an integer rank (rank-based
  percentile, no interpolation) so the clip bounds are exact data
  values, not floats;
- the z-score test |x - mu| > 2*sigma is algebraized to the
  all-integer comparison (n*x - S)^2 > 4*(n*Q - S^2) with S = sum(x),
  Q = sum(x^2) in cents, so no float mean/stddev ever materializes.
  The squares run in DECIMAL(38,0) / HUGEINT — at 100 TB group sizes
  the int64 square would overflow, the 38-digit square cannot.

Scale notes: winsorize is ONE shuffle on the group key (row_number +
count + bound extraction are windows over the same partitioning, so
Catalyst plans a single exchange); the z-score pass is a partial-agg
groupBy (map-side combine) whose per-group moments are a constant-size
struct, then a broadcast join back — the same two-pass shape as any
mean/variance normalization at scale. No window over an unpartitioned
ordering anywhere.

Reference parity: the reference hard-codes tolerance thresholds on
match distance (src/prediction_producer.py:112-118, face distance
<= 0.6); these operators are that thresholding made statistical,
per-group, and exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.money import cents_duck, cents_spark
from ..sources import load_table
from .registry import query

# winsorize at the 5th / 95th rank-percentile
_LO_PCT = 5
_HI_PCT = 95


@query(
    "winsorize_values_by_type",
    oracle=f"""
    WITH x AS (
        SELECT event_id, event_type,
               {cents_duck('value')} AS v_c,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY {cents_duck('value')}, event_id
               ) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    k AS (
        SELECT *,
               CAST(floor(({_LO_PCT} * n + 99) / 100) AS BIGINT) AS k_lo,
               CAST(floor(({_HI_PCT} * n + 99) / 100) AS BIGINT) AS k_hi
        FROM x
    ),
    b AS (
        SELECT *,
               max(CASE WHEN rn = k_lo THEN v_c END)
                   OVER (PARTITION BY event_type) AS lo_c,
               max(CASE WHEN rn = k_hi THEN v_c END)
                   OVER (PARTITION BY event_type) AS hi_c
        FROM k
    )
    SELECT event_id, event_type, v_c AS value_cents,
           least(greatest(v_c, lo_c), hi_c) AS clipped_cents
    FROM b
    """,
)
def winsorize_values_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type winsorization: values below the 5th / above the
    95th rank-percentile are clipped to the value AT that rank
    (k = ceil(p*n/100), ties broken by event_id — exact data values,
    no interpolation, so the result hashes). All three windows share
    the event_type partitioning: one exchange total."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", cents_spark(F.col("value")).alias("v_c")
    )
    w_ord = W.partitionBy("event_type").orderBy("v_c", "event_id")
    w_all = W.partitionBy("event_type")
    n = F.count("*").over(w_all)
    rn = F.row_number().over(w_ord)
    # integer ceil(p*n/100); operands < 2^53 so the double div is exact
    k_lo = F.floor((F.lit(_LO_PCT) * n + 99) / 100).cast("bigint")
    k_hi = F.floor((F.lit(_HI_PCT) * n + 99) / 100).cast("bigint")
    ranked = ev.select(
        "event_id",
        "event_type",
        "v_c",
        rn.alias("rn"),
        k_lo.alias("k_lo"),
        k_hi.alias("k_hi"),
    )
    lo = F.max(F.when(F.col("rn") == F.col("k_lo"), F.col("v_c"))).over(w_all)
    hi = F.max(F.when(F.col("rn") == F.col("k_hi"), F.col("v_c"))).over(w_all)
    return ranked.select(
        "event_id",
        "event_type",
        F.col("v_c").alias("value_cents"),
        F.least(F.greatest(F.col("v_c"), lo), hi).alias("clipped_cents"),
    )


@query(
    "anomaly_zscore_events",
    oracle=f"""
    WITH x AS (
        SELECT event_type, {cents_duck('value')} AS v_c FROM events
    ),
    m AS (
        SELECT event_type,
               count(*) AS n,
               sum(v_c) AS s,
               sum(v_c * v_c) AS q
        FROM x GROUP BY event_type
    ),
    f AS (
        SELECT x.event_type,
               CAST(m.n * x.v_c - m.s AS HUGEINT) AS dev_n,
               CAST(4 AS HUGEINT) * (CAST(m.n AS HUGEINT) * CAST(m.q AS HUGEINT)
                   - CAST(m.s AS HUGEINT) * CAST(m.s AS HUGEINT)) AS var4_n2,
               m.n AS n
        FROM x JOIN m USING (event_type)
    )
    SELECT event_type,
           CAST(any_value(n) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN dev_n * dev_n > var4_n2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_anomalies
    FROM f GROUP BY event_type
    """,
)
def anomaly_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count per-event-type 2-sigma outliers with zero float
    arithmetic: |x - mu| > 2*sigma multiplied through by n^2 becomes
    (n*x - S)^2 > 4*(n*Q - S^2) over integer cents moments, squared in
    DECIMAL(38,0) (HUGEINT on the oracle side) so billion-row groups
    cannot overflow. Plan: one map-combined groupBy for (n, S, Q), a
    broadcast of the tiny moments table back onto the scan, then a
    second map-combined groupBy — no window, no sort."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", cents_spark(F.col("value")).alias("v_c")
    )
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("v_c").alias("s"),
        F.sum(F.col("v_c") * F.col("v_c")).alias("q"),
    )
    j = ev.join(F.broadcast(m), "event_type")
    big = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    dev_n = (big("n") * big("v_c") - big("s")).cast("decimal(38,0)")
    var4_n2 = (F.lit(4).cast("decimal(38,0)") * (big("n") * big("q") - big("s") * big("s"))).cast(
        "decimal(38,0)"
    )
    return (
        j.select(
            "event_type",
            F.col("n"),
            (dev_n * dev_n > var4_n2).cast("int").alias("is_anom"),
        )
        .groupBy("event_type")
        .agg(
            F.first("n").cast("bigint").alias("n_total"),
            F.sum("is_anom").cast("bigint").alias("n_anomalies"),
        )
    )


_EQD_BUCKETS = 8


@query(
    "histogram_equi_depth_value",
    oracle=f"""
    WITH x AS (
        SELECT event_type, {cents_duck('value')} AS v_c,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY {cents_duck('value')}, event_id
               ) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    b AS (
        SELECT event_type, v_c, n,
               CAST(floor(({_EQD_BUCKETS} * (rn - 1)) / n) AS BIGINT) AS bucket
        FROM x
    )
    SELECT event_type, bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(v_c) AS lo_c, max(v_c) AS hi_c
    FROM b GROUP BY event_type, bucket
    """,
)
def histogram_equi_depth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram of value per event_type: 8 buckets holding
    (near-)equal row counts with their exact [lo, hi] cent bounds —
    the statistic an optimizer or drift monitor wants where the
    equi-WIDTH histogram (histogram_value_buckets) lies under skew.
    Bucket assignment is rank arithmetic (floor(B*(rn-1)/n), exact in
    doubles below 2^53) over the same single per-type exchange the
    winsorize pass uses; boundaries come out of the bucket aggregate
    itself, so no second quantile pass and no interpolation — every
    bound is a real data value and the result hashes."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", cents_spark(F.col("value")).alias("v_c")
    )
    w_ord = W.partitionBy("event_type").orderBy("v_c", "event_id")
    w_all = W.partitionBy("event_type")
    rn = F.row_number().over(w_ord)
    n = F.count("*").over(w_all)
    bucket = F.floor((F.lit(_EQD_BUCKETS) * (rn - F.lit(1))) / n).cast("bigint")
    return (
        ev.select("event_type", "v_c", bucket.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("v_c").alias("lo_c"),
            F.max("v_c").alias("hi_c"),
        )
    )


@query(
    "corr_hourly_click_purchase",
    oracle="""
    WITH h AS (
        SELECT date_trunc('hour', ts) AS hr,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS y
        FROM events GROUP BY hr
    ),
    m AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
               CAST(sum(x*x) AS HUGEINT) AS qx, CAST(sum(y*y) AS HUGEINT) AS qy,
               CAST(sum(x*y) AS HUGEINT) AS sxy
        FROM h
    )
    SELECT CAST(n AS BIGINT) AS n_hours,
           CAST(CASE WHEN n*sxy - sx*sy > 0 THEN 1
                     WHEN n*sxy - sx*sy < 0 THEN -1 ELSE 0 END AS INT) AS sign,
           CAST(CASE
                WHEN n*qx - sx*sx = 0 OR n*qy - sy*sy = 0 THEN NULL
                WHEN n*qx - sx*sx >= n*qy - sy*sy THEN
                     ((1000000 * (n*sxy - sx*sy) * (n*sxy - sx*sy))
                      // (n*qx - sx*sx)) // (n*qy - sy*sy)
                ELSE ((1000000 * (n*sxy - sx*sy) * (n*sxy - sx*sy))
                      // (n*qy - sy*sy)) // (n*qx - sx*sx)
                END AS BIGINT) AS r2_ppm
    FROM m
    """,
)
def corr_hourly_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between hourly click volume and hourly
    purchase volume, exact across engines: r is irrational (sqrt), so
    the engine reports r^2 in ppm plus the sign — r^2 = (n*Sxy -
    Sx*Sy)^2 / ((n*Qx - Sx^2)(n*Qy - Sy^2)) is a ratio of integers,
    computed in DECIMAL(38,0)/HUGEINT with one exact final division.
    The profiling staple (correlation matrices over metric pairs) in
    the same no-float-accumulation discipline as the z-score pass.
    Plan: one (hour) partial-agg shuffle for the paired series, then a
    single global moments aggregate — two exchanges, the second one
    carrying one row per hour."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.sum((F.col("event_type") == "click").cast("long")).alias("x"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("y"),
    )
    big = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = h.agg(
        big(F.count("*")).alias("n"),
        big(F.sum("x")).alias("sx"),
        big(F.sum("y")).alias("sy"),
        big(F.sum(F.col("x") * F.col("x"))).alias("qx"),
        big(F.sum(F.col("y") * F.col("y"))).alias("qy"),
        big(F.sum(F.col("x") * F.col("y"))).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("qx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("qy") - F.col("sy") * F.col("sy")
    parts = m.select(
        F.col("n").cast("bigint").alias("n_hours"),
        F.signum(num).cast("int").alias("sign"),
        (F.lit(1000000).cast("decimal(38,0)") * num * num).alias("num2"),
        vx.alias("vx"),
        vy.alias("vy"),
    )
    return parts.select(
        "n_hours",
        "sign",
        _r2_ppm_exact(F.col("num2"), F.col("vx"), F.col("vy")).alias("r2_ppm"),
    )


def _r2_ppm_exact(num2, vx, vy):
    """``floor(num2 / (vx * vy))`` as BIGINT, exact for ANY operands
    that fit decimal(38,0); NULL when either variance is zero (on both
    engines — the oracle's CASE mirrors this).

    Exact integer floor division (DuckDB ``//``): a decimal ``/``
    rounds the quotient at its result scale, so ``fdiv(a, b) =
    (a - a %% b) / b`` subtracts the remainder first — the division is
    then exact and no rounding can disagree with the oracle's
    truncation. Two-step, never the vx*vy product (which overflows
    decimal(38,0) first): for non-negative a and positive m, n,
    floor(floor(a/m)/n) == floor(a/(m*n)).

    Why not Spark's ``div``: ``div`` casts EACH quotient to BIGINT, and
    the intermediate ``num2 div max(vx,vy)`` is bounded only by
    10^6 * min(vx,vy) — a large co-varying series (min variance above
    ~9.2e12, e.g. a decade of hourly counts with std ~1e3) overflows
    Long even though num2 fits decimal(38,0), yielding Spark
    NULL-or-error vs a DuckDB HUGEINT value (r07 advice). Here the
    intermediate quotient stays decimal: it is an exact integer
    <= min(10^6 * vmin, 10^38 / vmax) <= 10^22 (maximized at
    vmin = vmax = 10^16), inside decimal(38,6)'s 10^32 integer range;
    only the FINAL quotient — <= 10^6, since r^2 <= 1 — casts to
    BIGINT. Overall bound unchanged and documented (like the z-score
    pass): exact while 10^6*num^2 < 10^38, i.e. |num| <= 3.1e15; with
    H hours and hourly std-devs sx_, sy_ that is num ~ H^2*sx_*sy_*r,
    so a decade of hourly data (H ~ 9e4) stays exact up to ~6e2
    events/hour of co-fluctuation."""
    vmax, vmin = F.greatest(vx, vy), F.least(vx, vy)
    q1 = (num2 - num2 % vmax) / vmax  # exact integer, decimal(38,6)
    q2 = (q1 - q1 % vmin) / vmin      # exact integer <= 10^6
    # the when() guard also keeps ANSI mode from evaluating /0 rows
    return F.when(vmin > F.lit(0).cast("decimal(38,0)"), q2.cast("bigint"))
