"""Preference queries: the skyline (Pareto-frontier) operator.

A skyline query returns the rows no other row dominates — here the
orders that are simultaneously recent and cheap: an order is on the
frontier unless some other order is at least as recent AND at most as
expensive, strictly better in one of the two. The classic formulation
is a quadratic NOT EXISTS self-join (the DuckDB oracle below); the
engine instead computes it with zero self-joins via the
sort-and-running-min identity: after ordering by date, a row is
dominated exactly when some strictly-later (or same-day-cheaper) row
has price <= its own, which is a running MIN — a window, not a join.

Scale notes: a bare ``Window.orderBy`` (no partition key) would drag
the whole table through ONE task, so the frontier test is split into
a three-level decomposition that keeps every window partitioned:

1. rows are bucketed by month; all dates in a later month strictly
   exceed all dates in an earlier month, so cross-bucket dominance
   collapses to "is any LATER bucket's min price <= mine" — a
   running min over the tiny per-bucket aggregate (#buckets rows,
   broadcast back);
2. within a bucket, strictly-later days are a RANGE window
   partitioned by bucket (bounded partition size);
3. same-day ties use the per-(bucket, day) min.

Total cost: one partial-agg shuffle for the bucket mins + one
(bucket)-partitioned window sort — O(n log n/p) per partition, no
pairwise work, and the month bucket count grows with the DATA RANGE,
not the data volume, so the broadcast side stays tiny at 100 TB.

Reference parity: the reference keeps only the latest frame per
camera (web/views.py:200-236) — a 1-D skyline keyed by camera; this
is the 2-D generalization every "best tradeoff" query needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.money import cents_duck, cents_spark
from ..sources import load_table
from .registry import query


@query(
    "skyline_pareto_orders",
    oracle=f"""
    WITH o AS (
        SELECT o_orderkey, o_orderdate,
               {cents_duck('o_totalprice')} AS price_cents
        FROM orders
    )
    SELECT b.o_orderkey, b.o_orderdate, b.price_cents
    FROM o b
    WHERE NOT EXISTS (
        SELECT 1 FROM o a
        WHERE a.o_orderdate >= b.o_orderdate
          AND a.price_cents <= b.price_cents
          AND (a.o_orderdate > b.o_orderdate
               OR a.price_cents < b.price_cents)
    )
    """,
)
def skyline_pareto_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of orders on (recency max, price min): an order
    survives iff no other order is >= as recent and <= as cheap with
    one strict. Computed join-free — month-bucket running min for
    cross-bucket dominance, a bucket-partitioned RANGE window over
    days for within-bucket, and a per-day min for ties — while the
    oracle is the textbook quadratic NOT EXISTS."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        cents_spark(F.col("o_totalprice")).alias("price_cents"),
        F.datediff("o_orderdate", F.lit("1970-01-01")).alias("day"),
        F.trunc("o_orderdate", "month").alias("bucket"),
    )
    # later-bucket min price: tiny aggregate (one row per month), the
    # single-partition window over it is O(#months), then broadcast.
    bmin = o.groupBy("bucket").agg(F.min("price_cents").alias("bmin"))
    # "min over later rows" is phrased as a GROWING frame over the
    # DESCENDING order (unbounded preceding .. 1 preceding), never a
    # shrinking (1 following .. unbounded following) one: Spark's
    # WindowExec evaluates growing frames incrementally (O(n) per
    # partition) but recomputes shrinking frames from scratch per row
    # (O(n^2) — measured 10x out of 13.5 s at the 10x probe before
    # this flip, 1.0 s after).
    wb = W.orderBy(F.col("bucket").desc()).rowsBetween(W.unboundedPreceding, -1)
    later = bmin.select(
        "bucket", F.min("bmin").over(wb).alias("later_min")
    )
    j = o.join(F.broadcast(later), "bucket")
    # strictly-later days inside my bucket (RANGE on integer days,
    # descending + growing frame for the same reason as above)
    w_day = (
        W.partitionBy("bucket")
        .orderBy(F.col("day").desc())
        .rangeBetween(W.unboundedPreceding, -1)
    )
    # same-day peers
    w_tie = W.partitionBy("bucket", "day")
    m_later_day = F.min("price_cents").over(w_day)
    m_same_day = F.min("price_cents").over(w_tie)
    survive = (
        (F.col("later_min").isNull() | (F.col("price_cents") < F.col("later_min")))
        & (m_later_day.isNull() | (F.col("price_cents") < m_later_day))
        & (F.col("price_cents") == m_same_day)
    )
    return (
        j.withColumn("_s", survive)
        .filter(F.col("_s"))
        .select("o_orderkey", "o_orderdate", "price_cents")
    )
