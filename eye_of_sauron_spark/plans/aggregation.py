"""Aggregation layer: hash aggregates, multi-distinct, grouping
analytics (cube / rollup / grouping sets), order statistics,
conditional aggregation, approximate distinct.

The reference has no group-by at all — its only aggregate is the
implicit stream-global buffer length (reference src/utils.py:56) and
the per-frame top-1 match (src/prediction_producer.py:351-353). This
module is the full aggregate surface mandated by SURVEY.md §2 Part B.

Scale notes: every aggregate here is partial+final (map-side combine)
by Catalyst default, so shuffle volume is O(groups), not O(rows).
Multi-distinct rewrites to expand+two-phase agg; approx_count_distinct
is the HLL path for 100 TB cardinalities where exact distinct would
need a full shuffle of the key universe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "cube_quantity",
    oracle="""
    SELECT CAST(grouping(l_returnflag) AS INT) AS g_flag,
           CAST(grouping(l_linestatus) AS INT) AS g_status,
           l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dims with grouping() indicators."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("*").alias("n_rows"),
    ).select(
        "g_flag", "g_status", "l_returnflag", "l_linestatus", "sum_qty", "n_rows"
    )


@query(
    "rollup_orders_by_month",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mon,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (yr, mon)
    """,
)
def rollup_orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP on a derived (year, month) hierarchy."""
    orders = _t(spark, sf_dir, "orders").select(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mon"),
        "o_totalprice",
    )
    return orders.rollup("yr", "mon").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@query(
    "grouping_sets_mixed",
    oracle="""
    SELECT c_mktsegment, c_nationkey,
           count(*) AS n_customers,
           round(avg(c_acctbal), 4) AS avg_bal
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    """,
)
def grouping_sets_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with disjoint key sets (SQL surface — the
    DataFrame API has no grouping-sets builder)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("gs_customer")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey,
               count(*) AS n_customers,
               round(avg(c_acctbal), 4) AS avg_bal
        FROM gs_customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        """
    )


@query(
    "multi_distinct_by_priority",
    oracle="""
    SELECT o.o_orderpriority,
           count(DISTINCT l.l_partkey) AS n_parts,
           count(DISTINCT l.l_suppkey) AS n_suppliers,
           count(*) AS n_items
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def multi_distinct_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) in one aggregate (Catalyst expands to
    a two-phase plan; at scale this is the expensive-but-exact path)."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_suppkey")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count("*").alias("n_items"),
        )
    )


@query("approx_distinct_users", oracle=None)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per event_type — the
    100 TB replacement for exact distinct. Rows-only check: HLL
    estimates are engine-specific so no DuckDB oracle;
    tests/test_aggregates.py bounds the error against exact
    countDistinct instead."""
    events = _t(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.count("*").alias("n_events"),
    )


@query(
    "stats_acctbal_by_nation",
    oracle="""
    SELECT c_nationkey,
           count(*) AS n,
           round(avg(c_acctbal), 4) AS mean_bal,
           round(stddev_samp(c_acctbal), 4) AS sd_bal,
           round(var_samp(c_acctbal), 4) AS var_bal,
           round(min(c_acctbal), 2) AS min_bal,
           round(max(c_acctbal), 2) AS max_bal
    FROM customer
    GROUP BY c_nationkey
    """,
)
def stats_acctbal_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moment statistics per group (stddev/variance)."""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.count("*").alias("n"),
        F.round(F.avg("c_acctbal"), 4).alias("mean_bal"),
        F.round(F.stddev_samp("c_acctbal"), 4).alias("sd_bal"),
        F.round(F.var_samp("c_acctbal"), 4).alias("var_bal"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )


@query(
    "median_percentiles_value",
    oracle="""
    SELECT event_type,
           round(median(value), 4) AS p50,
           round(quantile_cont(value, 0.9), 4) AS p90,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events
    GROUP BY event_type
    """,
)
def median_percentiles_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles — the reference's latency
    distribution analysis (prediction_producer.py:229-238 CSV ->
    graphs) as a first-class aggregate. At 100 TB swap for
    percentile_approx (t-digest-style sketch, bounded memory)."""
    events = _t(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
    )


@query(
    "conditional_agg_event_matrix",
    oracle="""
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
           round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2) AS purchase_value,
           count(*) AS n_total
    FROM events
    GROUP BY user_id
    """,
)
def conditional_agg_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (pivot-by-hand) — one pass, no join."""
    e = _t(spark, sf_dir, "events")
    is_purchase = F.col("event_type") == "purchase"
    return e.groupBy("user_id").agg(
        F.sum(F.when(is_purchase, 1).otherwise(0)).cast("bigint").alias("n_purchase"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("n_error"),
        F.round(F.sum(F.when(is_purchase, F.col("value")).otherwise(0.0)), 2).alias(
            "purchase_value"
        ),
        F.count("*").alias("n_total"),
    )


@query(
    "pivot_event_counts",
    oracle="""
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events
    GROUP BY user_id
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (explicit list = no extra
    distinct-values job; required discipline at scale)."""
    e = _t(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    out = (
        e.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    # pivot yields nulls for absent combos; the CASE oracle yields 0
    return out.select(
        "user_id",
        *[F.coalesce(F.col(k), F.lit(0)).cast("bigint").alias(k) for k in kinds],
    )


@query(
    "histogram_value_buckets",
    oracle="""
    SELECT CAST(floor(value / 50.0) AS INT) AS bucket,
           count(*) AS n,
           round(sum(value), 2) AS bucket_value
    FROM events
    GROUP BY bucket
    """,
)
def histogram_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric bucketing histogram (width 50)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn("bucket", F.floor(F.col("value") / 50.0).cast("int"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("bucket_value"),
        )
    )


@query("sketch_quantiles_value", oracle=None)
def sketch_quantiles_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (KLL-style mergeable quantile sketch) per
    event_type — the 100 TB replacement for exact percentiles (the
    exact path is median_percentiles_value): one partial+final
    aggregate, sketch size O(1/accuracy), no global sort. Rows-only
    check: sketch estimates are engine-specific;
    tests/test_aggregates.py bounds the rank error against the exact
    percentile instead.

    The sketch is unpacked into three scalar double columns (p50/p90/
    p99) rather than returned as one array<double> — the driver's
    canonicalizer sorts a pandas frame over every column and dies on
    unhashable list cells (CORRECTNESS_r02 err)."""
    events = _t(spark, sf_dir, "events")
    sketched = events.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.9, 0.99], 10_000).alias("approx_pcts"),
        F.count("*").alias("n_events"),
    )
    return sketched.select(
        "event_type",
        F.try_element_at("approx_pcts", F.lit(1)).alias("p50"),
        F.try_element_at("approx_pcts", F.lit(2)).alias("p90"),
        F.try_element_at("approx_pcts", F.lit(3)).alias("p99"),
        "n_events",
    )
