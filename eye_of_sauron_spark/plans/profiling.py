"""Data profiling and expectation validation (Deequ/TFDV-shape).

Before any 100 TB corpus is trained on, it is PROFILED (per-column
nulls / distincts / ranges — the stats a query optimizer or drift
monitor feeds on) and VALIDATED (declarative expectations with
violation counts — the circuit breaker between ingest and training).
Both run as ONE pass over the scan: every per-column statistic is an
aggregate branch of a single ``agg`` (Catalyst plans multi-distinct
via one Expand — still a single scan + one aggregation tree), and the
wide one-row result is exploded to the long (col_name, stats) /
(rule, verdict) form with a narrow inline array — no per-column
re-scan, no join.

Numerics are profiled in integer units (cents / epoch-micros) and
strings as strings, so min/max hash identically across engines.

Reference parity: the reference validates inputs only by crashing
(missing keys raise in consumer loops, e.g. src/utils.py:82-100);
these operators are that contract made declarative and counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import cents_duck, cents_spark
from ..sources import load_table
from .registry import query

_KNOWN_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "profile_events_columns",
    oracle=f"""
    WITH e AS (
        SELECT event_id, user_id, event_type,
               {cents_duck('value')} AS v_c,
               CAST(epoch_us(ts) AS BIGINT) AS ts_us
        FROM events
    )
    SELECT 'event_id' AS col_name, count(*) AS n_rows,
           CAST(count(*) - count(event_id) AS BIGINT) AS n_null,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
           min(event_id) AS min_num, max(event_id) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM e
    UNION ALL
    SELECT 'user_id', count(*),
           CAST(count(*) - count(user_id) AS BIGINT),
           CAST(count(DISTINCT user_id) AS BIGINT),
           min(user_id), max(user_id), NULL, NULL
    FROM e
    UNION ALL
    SELECT 'value_cents', count(*),
           CAST(count(*) - count(v_c) AS BIGINT),
           CAST(count(DISTINCT v_c) AS BIGINT),
           min(v_c), max(v_c), NULL, NULL
    FROM e
    UNION ALL
    SELECT 'ts_micros', count(*),
           CAST(count(*) - count(ts_us) AS BIGINT),
           CAST(count(DISTINCT ts_us) AS BIGINT),
           min(ts_us), max(ts_us), NULL, NULL
    FROM e
    UNION ALL
    SELECT 'event_type', count(*),
           CAST(count(*) - count(event_type) AS BIGINT),
           CAST(count(DISTINCT event_type) AS BIGINT),
           NULL, NULL, min(event_type), max(event_type)
    FROM e
    """,
)
def profile_events_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of the events table — row count, null count,
    exact distinct count, and min/max (numeric columns in integer
    cents / epoch-micros, strings as strings) — still ONE scan, but
    stated as an explicit unpivot + two-level aggregate instead of a
    five-distinct single agg (r17 optimization). The multi-distinct
    form makes Catalyst plan one Expand with SIX projections of the
    full row stream and a first-phase hash aggregate keyed by (gid +
    all five value columns) — every input row is materialized six
    times into a wide grouping buffer before any reduction. Here each
    row explodes into five narrow (col_name, nv, sv) cells, the first
    aggregate reduces them to distinct (col_name, value) groups
    map-side, and the second derives EVERY profile statistic from
    that group relation: n_rows = sum(cnt), n_null = the null group's
    cnt, n_distinct = count of non-null groups, min/max over group
    keys. Measured interleaved at sf0.1: 2.83 -> 1.00 s median
    (guide §2.3: narrower rows through both exchanges). The oracle
    states the same numbers as five plain subqueries."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        cents_spark(F.col("value")).alias("v_c"),
        F.unix_micros("ts").alias("ts_us"),
    )
    out_names = {
        "event_id": "event_id",
        "user_id": "user_id",
        "v_c": "value_cents",
        "ts_us": "ts_micros",
    }
    num_cols = ["event_id", "user_id", "v_c", "ts_us"]
    cells = [
        F.struct(
            F.lit(out_names[c]).alias("col_name"),
            F.col(c).cast("bigint").alias("nv"),
            F.lit(None).cast("string").alias("sv"),
        )
        for c in num_cols
    ] + [
        F.struct(
            F.lit("event_type").alias("col_name"),
            F.lit(None).cast("bigint").alias("nv"),
            F.col("event_type").alias("sv"),
        )
    ]
    long = e.select(F.explode(F.array(*cells)).alias("r")).select("r.*")
    lvl1 = long.groupBy("col_name", "nv", "sv").agg(F.count("*").alias("cnt"))
    nonnull = F.col("nv").isNotNull() | F.col("sv").isNotNull()
    return lvl1.groupBy("col_name").agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.sum(F.when(~nonnull, F.col("cnt")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_null"),
        F.count(F.when(nonnull, F.lit(1))).cast("bigint").alias("n_distinct"),
        F.min("nv").cast("bigint").alias("min_num"),
        F.max("nv").cast("bigint").alias("max_num"),
        F.min("sv").alias("min_str"),
        F.max("sv").alias("max_str"),
    )


@query(
    "validate_events_expectations",
    oracle=f"""
    WITH agg AS (
        SELECT count(*) AS n,
               sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS v_neg,
               sum(CASE WHEN value > 500 THEN 1 ELSE 0 END) AS v_cap,
               sum(CASE WHEN event_type IS NULL OR event_type NOT IN
                   ('click','error','purchase','signup','view')
                   THEN 1 ELSE 0 END) AS v_type,
               sum(CASE WHEN ts < TIMESTAMP '2024-01-01'
                         OR ts >= TIMESTAMP '2027-01-01'
                   THEN 1 ELSE 0 END) AS v_ts,
               count(*) - count(DISTINCT event_id) AS v_uniq
        FROM events
    )
    SELECT rule, CAST(n AS BIGINT) AS n_checked,
           CAST(viol AS BIGINT) AS n_violations,
           viol = 0 AS passed
    FROM agg, (VALUES ('value_non_negative'), ('value_at_most_500'),
                      ('event_type_known'), ('ts_in_supported_range'),
                      ('event_id_unique')) t(rule),
    LATERAL (SELECT CASE rule
        WHEN 'value_non_negative' THEN v_neg
        WHEN 'value_at_most_500' THEN v_cap
        WHEN 'event_type_known' THEN v_type
        WHEN 'ts_in_supported_range' THEN v_ts
        ELSE v_uniq END AS viol) v
    """,
)
def validate_events_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectation suite over events — non-negative and
    capped value, known event_type vocabulary, supported timestamp
    range, unique event_id — reported as per-rule (checked,
    violations, passed). All five rules are aggregate branches of ONE
    scan (uniqueness via count - countDistinct, no self-join); the
    one-row result explodes to the per-rule report. The gate a
    training pipeline puts between ingest and everything else."""
    ev = load_table(spark, sf_dir, "events")
    viol = lambda c: F.sum(c.cast("int"))  # noqa: E731
    wide = ev.agg(
        F.count("*").alias("n"),
        viol(F.col("value") < 0).alias("v_neg"),
        viol(F.col("value") > 500).alias("v_cap"),
        viol(
            F.col("event_type").isNull()
            | ~F.col("event_type").isin(*_KNOWN_TYPES)
        ).alias("v_type"),
        viol(
            (F.col("ts") < F.lit("2024-01-01").cast("timestamp"))
            | (F.col("ts") >= F.lit("2027-01-01").cast("timestamp"))
        ).alias("v_ts"),
        (F.count("*") - F.countDistinct("event_id")).alias("v_uniq"),
    )
    rules = [
        ("value_non_negative", "v_neg"),
        ("value_at_most_500", "v_cap"),
        ("event_type_known", "v_type"),
        ("ts_in_supported_range", "v_ts"),
        ("event_id_unique", "v_uniq"),
    ]
    rows = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col("n").cast("bigint").alias("n_checked"),
            F.col(col).cast("bigint").alias("n_violations"),
            (F.col(col) == 0).alias("passed"),
        )
        for name, col in rules
    ]
    return wide.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
