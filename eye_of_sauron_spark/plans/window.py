"""Window functions: ranking, offsets (lag/lead), running and moving
frames, distribution functions.

Reference parity: the first-match-in-upload-order semantics of the
face matcher (reference src/prediction_producer.py:321-323) is a
ranking window (row_number over target index); the per-frame latency
series it logs (prediction_producer.py:355-361) becomes running /
moving aggregates here.

Scale notes: every window below partitions by a key (customer, user)
— Spark shuffles once per distinct (partitionBy, orderBy) pair and
sorts within partitions; no global sort. Skewed partitions (one hot
user) are the failure mode to watch; AQE does not split window
partitions, so key design matters more than for joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.money import cents_spark
from ..sources import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "window_rank_customers",
    oracle="""
    SELECT c_nationkey, c_custkey,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           round(percent_rank() OVER w, 6) AS prnk
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
    QUALIFY rank() OVER w <= 3
    """,
)
def window_rank_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / percent_rank, top-3 per nation."""
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        c.select(
            "c_nationkey",
            "c_custkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.round(F.percent_rank().over(w), 6).alias("prnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@query(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_spend
    FROM orders
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) sum per customer over order history."""
    o = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@query(
    "window_lag_event_gaps",
    oracle="""
    SELECT user_id,
           count(*) AS n_gaps,
           round(avg(gap_us / 1000000.0), 4) AS avg_gap_sec,
           round(max(gap_us / 1000000.0), 4) AS max_gap_sec
    FROM (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ) AS gap_us
        FROM events
    )
    WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
)
def window_lag_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag(): inter-event gap statistics per user — the engine's
    version of the reference's per-frame latency series (A8)."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gaps = e.select(
        "user_id",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count("*").alias("n_gaps"),
        F.round(F.avg(F.col("gap_us") / 1_000_000.0), 4).alias("avg_gap_sec"),
        F.round(F.max(F.col("gap_us") / 1_000_000.0), 4).alias("max_gap_sec"),
    )


@query(
    "window_moving_avg",
    oracle="""
    SELECT user_id, event_id,
           round(avg(value) OVER (
               PARTITION BY user_id
               ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ), 4) AS moving_avg_3
    FROM events
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average over a 3-row frame per user."""
    e = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-2, W.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 4).alias("moving_avg_3"),
    )


@query(
    "window_lead_transitions",
    oracle="""
    SELECT event_type, next_type, count(*) AS n
    FROM (
        SELECT event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ) AS next_type
        FROM events
    )
    WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def window_lead_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead(): event-type transition matrix (Markov counts)."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        e.select(
            "event_type",
            F.lead("event_type").over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
    )


@query(
    "window_ntile_spend_quartiles",
    oracle="""
    SELECT quartile, count(*) AS n_customers,
           round(sum(spend), 2) AS quartile_spend
    FROM (
        SELECT c.c_custkey,
               coalesce(sum(o.o_totalprice), 0) AS spend,
               ntile(4) OVER (
                   ORDER BY coalesce(sum(o.o_totalprice), 0) DESC, c.c_custkey ASC
               ) AS quartile
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY quartile
    """,
)
def window_ntile_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-spend quartiles with ntile(4) semantics, computed
    WITHOUT a single-partition global window.

    A bare ``ntile(4).over(orderBy(...))`` sorts the whole relation in
    one task — the one serial bottleneck flagged in round 1. Instead:
    range-repartition on the sort key (parallel sort), take a local
    row_number per partition, add per-partition offsets (a tiny
    aggregate over ≤ #partitions rows, broadcast back), and derive the
    quartile from the exact ntile bucket arithmetic: with n rows and k
    buckets, the first n%k buckets get n//k+1 rows, the rest n//k.
    Every stage is parallel; the only driver-sized data is the offsets
    table. The oracle states the same result with a plain ntile(4).
    """
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    spend = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)).alias("spend"))
    )
    order = [F.col("spend").desc(), F.col("c_custkey").asc()]
    by_range = (
        spend.repartitionByRange(32, *order)
        .sortWithinPartitions(*order)
        .withColumn("pid", F.spark_partition_id())
    )
    counts = by_range.groupBy("pid").agg(F.count("*").alias("cnt"))
    w_prev = W.orderBy("pid").rowsBetween(W.unboundedPreceding, -1)
    w_all = W.orderBy("pid").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    offsets = counts.select(
        "pid",
        F.coalesce(F.sum("cnt").over(w_prev), F.lit(0)).alias("offset"),
        F.sum("cnt").over(w_all).alias("n_total"),
    )
    w_local = W.partitionBy("pid").orderBy(*order)
    big = F.floor(F.col("n_total") / 4) + 1  # size of the first n%4 buckets
    small = F.floor(F.col("n_total") / 4)
    rem = F.col("n_total") % 4
    ranked = (
        by_range.join(F.broadcast(offsets), "pid")
        .withColumn("rn", F.col("offset") + F.row_number().over(w_local))
        .withColumn(
            "quartile",
            F.when(F.col("rn") <= big * rem, F.ceil(F.col("rn") / big)).otherwise(
                rem + F.ceil((F.col("rn") - big * rem) / small)
            ),
        )
    )
    return ranked.groupBy("quartile").agg(
        F.count("*").alias("n_customers"),
        F.round(F.sum("spend"), 2).alias("quartile_spend"),
    )


@query(
    "window_first_match_semantics",
    oracle="""
    SELECT l_orderkey, l_partkey AS first_part,
           round(l_extendedprice, 2) AS first_price
    FROM (
        SELECT l_orderkey, l_partkey, l_extendedprice,
               row_number() OVER (
                   PARTITION BY l_orderkey
                   ORDER BY l_linenumber ASC, l_partkey ASC, l_extendedprice ASC
               ) AS rn
        FROM lineitem
    )
    WHERE rn = 1
    """,
)
def window_first_match_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST-in-order selection — the reference matcher returns the
    first target within tolerance in upload order, NOT the argmin
    (prediction_producer.py:321-323). Here: first lineitem per order.

    l_linenumber repeats within an order in this data, so the window
    carries a full tie-break (linenumber, partkey, price) — a bare
    min_by would be nondeterministic across engines.
    """
    li = _t(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy(
        F.col("l_linenumber").asc(),
        F.col("l_partkey").asc(),
        F.col("l_extendedprice").asc(),
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_orderkey",
            F.col("l_partkey").alias("first_part"),
            F.round("l_extendedprice", 2).alias("first_price"),
        )
    )


@query(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
        SELECT user_id, ts, event_id, event_type,
               max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) OVER w
                   AS seen_view
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)
    ),
    c AS (
        SELECT *,
               CASE WHEN event_type = 'click' AND seen_view = 1
                    THEN 1 ELSE 0 END AS click_ok,
               max(CASE WHEN event_type = 'click' AND seen_view = 1
                        THEN 1 ELSE 0 END) OVER w AS seen_click
        FROM v
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)
    ),
    reach AS (
        SELECT user_id,
               max(seen_view) AS r1,
               max(click_ok) AS r2,
               max(CASE WHEN event_type = 'purchase' AND seen_click = 1
                        THEN 1 ELSE 0 END) AS r3
        FROM c GROUP BY user_id
    ),
    tot AS (
        SELECT sum(r1) AS nv, sum(r2) AS nc, sum(r3) AS np, count(*) AS n
        FROM reach
    )
    SELECT '1_view' AS stage, CAST(nv AS BIGINT) AS n_users,
           round(nv * 1.0 / nullif(n, 0), 6) AS conv FROM tot
    UNION ALL
    SELECT '2_click', CAST(nc AS BIGINT),
           round(nc * 1.0 / nullif(nv, 0), 6) FROM tot
    UNION ALL
    SELECT '3_purchase', CAST(np AS BIGINT),
           round(np * 1.0 / nullif(nc, 0), 6) FROM tot
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel over the event stream: a user
    "converts" at stage k only via an ORDERED subsequence
    view -> click -> purchase (a click before any view does not count,
    nor a purchase before such a click) — the sequence-dependency
    shape a bare conditional aggregation cannot express.

    Plan: three chained cumulative-max windows over the SAME
    (partitionBy user_id, orderBy ts, event_id) spec — Catalyst plans
    one Exchange + one in-partition sort for all of them, so the whole
    funnel costs a single shuffle of (user_id, ts, type) at any scale;
    the per-user reach table then collapses by partial agg and the
    3-row stage output is driver-sized arithmetic. The reference
    analog is the first-match state machine of the matcher
    (src/prediction_producer.py:321-323) generalized to a multi-stage
    ordered-reachability check."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    return funnel_counts(ev)


def funnel_counts(ev: DataFrame) -> DataFrame:
    """Core of funnel_view_click_purchase over any (user_id, ts,
    event_id, event_type) relation — separate so property tests can
    drive it with arbitrary generated histories
    (tests/test_properties.py)."""
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    is_type = lambda t: (F.col("event_type") == t).cast("int")  # noqa: E731
    v = ev.withColumn("seen_view", F.max(is_type("view")).over(w))
    c = v.withColumn(
        "click_ok", (is_type("click") * F.col("seen_view")).cast("int")
    ).withColumn("seen_click", F.max("click_ok").over(w))
    reach = c.groupBy("user_id").agg(
        F.max("seen_view").alias("r1"),
        F.max("click_ok").alias("r2"),
        F.max(is_type("purchase") * F.col("seen_click")).alias("r3"),
    )
    tot = reach.agg(
        F.sum("r1").alias("nv"),
        F.sum("r2").alias("nc"),
        F.sum("r3").alias("np"),
        F.count("*").alias("n"),
    )

    def stage(name, num, den):
        return F.struct(
            F.lit(name).alias("stage"),
            F.col(num).cast("bigint").alias("n_users"),
            F.round(
                F.col(num) * 1.0 / F.when(F.col(den) > 0, F.col(den)), 6
            ).alias("conv"),
        )

    return tot.select(
        F.explode(
            F.array(
                stage("1_view", "nv", "n"),
                stage("2_click", "nc", "nv"),
                stage("3_purchase", "np", "nc"),
            )
        ).alias("s")
    ).select("s.*")


_ROLL_WINDOW_US = 3600 * 1_000_000  # 1-hour range frame, microseconds


@query(
    "window_time_range_rolling",
    oracle=f"""
    SELECT event_id, user_id,
           count(*) OVER w AS n_last_hour,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w
                AS BIGINT) AS cents_last_hour
    FROM events
    WINDOW w AS (
        PARTITION BY user_id ORDER BY epoch_us(ts)
        RANGE BETWEEN {_ROLL_WINDOW_US} PRECEDING AND CURRENT ROW
    )
    """,
)
def window_time_range_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-based rolling aggregate — a RANGE frame over event-time
    microseconds (count + value sum of each user's events in the
    trailing hour), the primitive behind rate limiting, rolling spend
    caps, and the reference's would-be rolling latency stats (A8,
    src/prediction_producer.py:355-361). Distinct from every
    rowsBetween query here: the frame width varies per row with event
    DENSITY, not row count, and ties on the order value are frame
    PEERS (both engines include all of them).

    The rolled sum is integer cents (floor(value*100 + 0.5) —
    explicit half-up, engine-agnostic) rather than a double: sliding-
    window sums are implemented as segment trees in some engines and
    sequential accumulation in others, so float results differ in the
    last bits; integer arithmetic is associative and hash-stable.
    One shuffle on user_id; in-partition sort by time; Spark evaluates
    the range frame with two moving pointers over the sorted run —
    O(n) per partition, no per-row rescan."""
    ev = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-_ROLL_WINDOW_US, W.currentRow)
    )
    cents = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_last_hour"),
        F.sum(cents).over(w).cast("bigint").alias("cents_last_hour"),
    )


@query(
    "window_percent_rank_acctbal",
    oracle="""
    SELECT c_custkey,
           c_nationkey,
           CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal)
    """,
)
def window_percent_rank_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative standing of each customer's balance within its nation:
    ``percent_rank`` ((rank-1)/(n-1)) and ``cume_dist`` (peers/n) over
    the per-nation balance ordering — the peer-group semantics (ties
    share a rank and a cume step) that ntile/row_number can't express.
    Both are exact integer ratios evaluated in one IEEE division, so
    the doubles hash identically across engines. Single exchange on
    c_nationkey."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal")
    return c.select(
        "c_custkey",
        "c_nationkey",
        cents_spark(F.col("c_acctbal")).alias("acctbal_cents"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
