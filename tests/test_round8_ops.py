"""Round-8 additions: overflow-safe exact r^2 division, in-plan sketch
contracts, and the face-pipeline closed-form oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from eye_of_sauron_spark.plans.robust import _r2_ppm_exact


def _eval_r2(spark, num2: int, vx: int, vy: int):
    df = spark.range(1).select(
        F.lit(str(num2)).cast("decimal(38,0)").alias("num2"),
        F.lit(str(vx)).cast("decimal(38,0)").alias("vx"),
        F.lit(str(vy)).cast("decimal(38,0)").alias("vy"),
    )
    return df.select(
        _r2_ppm_exact(F.col("num2"), F.col("vx"), F.col("vy")).alias("r")
    ).collect()[0]["r"]


def test_r2_division_exact_against_python_ints(spark):
    cases = [
        (1_000_000 * 7**2, 9, 11),          # tiny, r^2 < 1
        (1_000_000 * (3_10_000_000**2), 10**17, 10**18),  # mid-range
        (0, 5, 7),                           # zero numerator
    ]
    for num2, vx, vy in cases:
        assert _eval_r2(spark, num2, vx, vy) == num2 // vx // vy, (num2, vx, vy)


def test_r2_division_survives_bigint_intermediate_overflow(spark):
    """The r07-advice scenario: num2 // max(vx, vy) exceeds
    Long.MaxValue (the old `div` chain returned NULL / errored) while
    the true ppm result is small. vmin = vmax = 1e16, num = 1e15:
    intermediate quotient 1e20 > 9.2e18, final result exactly 1e4."""
    num2 = 1_000_000 * (10**15) ** 2  # 1e36, fits decimal(38,0)
    assert num2 // 10**16 > 2**63 - 1  # the old intermediate overflows
    assert _eval_r2(spark, num2, 10**16, 10**16) == 10**4


def test_r2_division_null_on_constant_series(spark):
    assert _eval_r2(spark, 0, 0, 5) is None
    assert _eval_r2(spark, 0, 5, 0) is None
    assert _eval_r2(spark, 0, 0, 0) is None
