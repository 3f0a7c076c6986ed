"""Integer-cents quantization (engine-portable).

Every oracle-hashed money aggregate quantizes per row to cents with
explicit half-up rounding BEFORE any cross-row sum: double sums are
order-dependent (partition order on Spark, scan order on DuckDB), so
only integer accumulation hashes bit-identically. One definition,
imported by every call site — drift in the rounding convention is a
single-file change.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents_spark(col: Column) -> Column:
    """floor(x * 100 + 0.5) as BIGINT — half-up toward +inf, matching
    :func:`cents_duck` exactly (also for negatives)."""
    return F.floor(col * 100 + F.lit(0.5)).cast("bigint")


def cents_duck(expr: str) -> str:
    return f"CAST(floor({expr} * 100 + 0.5) AS BIGINT)"
