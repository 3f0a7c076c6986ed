"""Grouped-map (applyInPandas) operators — the UDAF-shaped custom
aggregation path, and the ``spark.sql`` text interface.

The reference's per-camera consumer loop is exactly a grouped-map:
all messages for one camera flow through one Python function holding
per-camera context (src/prediction_producer.py:94-126). Here the
same shape is ``groupBy(key).applyInPandas(fn, schema)`` — Arrow
ships each group to Python as one DataFrame, the function returns
any number of rows, and Spark plans it as one shuffle on the key.

``sql_revenue_top_nations`` covers the other public API surface:
identical semantics driven through ``spark.sql`` over registered
views, proving a reference user can bring raw SQL instead of the
DataFrame DSL.

Scale notes: applyInPandas shuffles once on the grouping key; group
sizes must fit a worker's memory (per-user event history here —
thousands of rows, never the corpus). Outputs are integers so the
oracle hash-compare is exact, no float ULP exposure.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table, register_views
from .registry import query

_GAP_MINUTES = 10


def _session_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """One BUCKET of users per call (see the superkey note below):
    emit one stats row per user via a vectorized pandas groupby."""
    import numpy as np

    pdf = pdf.sort_values(["user_id", "ts"])
    us = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    uid = pdf["user_id"].to_numpy()
    new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
    gap = np.concatenate(([True], np.diff(us) >= _GAP_MINUTES * 60 * 1_000_000))
    starts = new_user | gap
    sid = np.cumsum(starts)  # global session ids across the bucket
    sess_sizes = np.bincount(sid)[1:]
    sess_user = uid[starts]
    out = pd.DataFrame({"user_id": sess_user, "n": sess_sizes})
    agg = out.groupby("user_id", sort=False).agg(
        n_events=("n", "sum"), n_sessions=("n", "size"), max_session_events=("n", "max")
    )
    return agg.reset_index().astype("int64")


@query(
    "grouped_map_session_stats",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL {_GAP_MINUTES} MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    numbered AS (
        SELECT user_id,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
               ) AS sid
        FROM marked
    ),
    per_session AS (
        SELECT user_id, sid, count(*) AS n FROM numbered GROUP BY user_id, sid
    )
    SELECT user_id,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(max(n) AS BIGINT) AS max_session_events
    FROM per_session GROUP BY user_id
    """,
)
def grouped_map_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessionization as a grouped-map pandas UDF: each
    user's full event history arrives as one pandas DataFrame (the
    reference's per-camera consumer-loop shape), sessions split on
    >= 10-minute gaps. The oracle rebuilds identical sessions with
    gaps-and-islands SQL — integer outputs, exact hash match.

    Scale lesson encoded here: grouping by the raw user_id would pay
    the per-group Arrow/pandas overhead once per user — ruinous with
    millions of tiny groups. Grouping by a SUPERKEY bucket
    (user_id % 64) ships ~1/64th of users per call and the function
    fans back out to per-user rows with a vectorized groupby; output
    and oracle are identical, per-call overhead amortizes 64x."""
    events = load_table(spark, sf_dir, "events").select("user_id", "ts")
    return events.groupBy((F.col("user_id") % 64).alias("bucket")).applyInPandas(
        _session_stats,
        "user_id long, n_events long, n_sessions long, max_session_events long",
    )


@query(
    "sql_revenue_top_nations",
    oracle="""
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    LIMIT 10
    """,
)
def sql_revenue_top_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw-SQL API surface: the same engine driven entirely by
    ``spark.sql`` text over registered views (sources/tables.py::
    register_views). Catalyst plans it identically to the DataFrame
    DSL — broadcast dims, partial aggs, TakeOrdered top-k."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name AS nation,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY n.n_name
        ORDER BY revenue DESC, nation
        LIMIT 10
        """
    )


_CORRELATED_SQL = """
    SELECT c.c_custkey, c.c_name,
           round(c.c_acctbal, 2) AS acctbal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT avg(c2.c_acctbal) FROM customer c2
        WHERE c2.c_nationkey = c.c_nationkey
    )
"""


@query("correlated_subquery_above_avg", oracle=_CORRELATED_SQL)
def correlated_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (customers above their own nation's
    average balance), run as raw SQL so Catalyst's decorrelation is
    exercised: the optimizer rewrites the per-row subquery into one
    aggregate + join — O(nations) aggregate rows, not a re-scan per
    customer. The oracle is the identical SQL, decorrelated by
    DuckDB's own unnesting."""
    register_views(spark, sf_dir)
    return spark.sql(_CORRELATED_SQL)
