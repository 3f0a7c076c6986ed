#!/usr/bin/env python
"""Per-query wall-time benchmark over the full query registry.

Runs every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized through the ``noop`` sink (computes
every column, writes nothing) so the timing covers the whole plan, not
just whatever a count() can prune away. A warmup query runs first so JVM
/ codegen startup is not billed to the first query in the dict.
"""

from __future__ import annotations

import json
import os
import pandas as pd
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from eye_of_sauron_spark import plans  # noqa: E402
from eye_of_sauron_spark.session import get_spark  # noqa: E402


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(sf_dir.rstrip("/")))
    return float(m.group(1)) if m else -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("eye_of_sauron_spark_bench")
    queries = plans.all_queries()

    # warmup: JVM, codegen, parquet footer reads, and the Python UDF
    # worker pool (so worker spawn isn't billed to whichever pandas-UDF
    # query happens to run first)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").write.format("noop").mode(
        "overwrite"
    ).save()
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _identity(s: pd.Series) -> pd.Series:
        return s

    spark.range(0, 1000, 1, 32).select(_identity(col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    # best-of-2 per query by default: single-JVM runs accumulate
    # GC/JIT noise that can swing one cold measurement 2-3x; the min
    # is the stable regression signal. For local drift triage set
    # SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_STAT=median — the
    # median of 3 separates a real plan regression from one
    # contention-inflated sample (SCALE.md "Benchmark variance note").
    # fault-isolated per query: one broken plan must never zero the
    # whole round's perf record (BENCH_r04 died with no numbers when a
    # single query raised at plan construction) — failures are recorded
    # as {"err": ...} rows and the run keeps going
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    stat = os.environ.get("SPARK_GRAFT_BENCH_STAT", "best")
    if stat not in ("best", "median"):
        # fail loudly: a typo'd stat silently mislabeling the metric
        # poisons every downstream BENCH comparison
        raise SystemExit(f"SPARK_GRAFT_BENCH_STAT must be best|median, got {stat!r}")
    # statistics.median averages the two middle samples for even n —
    # sorted(ts)[n//2] would report the WORSE of two runs as "median"
    pick = min if stat == "best" else statistics.median
    times: dict[str, object] = {}
    errors: dict[str, str] = {}
    t_all = time.perf_counter()
    for name in sorted(queries):
        samples: list[float] = []
        try:
            for _ in range(n_runs):
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(time.perf_counter() - t0)
            times[name] = round(pick(samples), 3)
        except Exception as exc:  # noqa: BLE001 — survive any one query
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
    wall = round(time.perf_counter() - t_all, 3)

    out = {
        "metric": f"sum_{stat}_of_{n_runs}_query_sec",
        "value": round(sum(t for t in times.values() if isinstance(t, float)), 3),
        "unit": "sec",
        "queries": {**times, **{n: {"err": e} for n, e in errors.items()}},
        "sf": _sf_from_dir(sf_dir),
        "n_queries": len(times),
        "n_errors": len(errors),
        "wall_sec_incl_reruns": wall,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
