#!/usr/bin/env python
"""Interleaved A/B timing of two plan builders (guide §1: measure
first; host windows drift, so candidates are judged on interleaved
same-window ratios, never on two solo runs).

Usage::

    python tools/ab_time.py <module>:<fn_a> <module>:<fn_b> [reps] [--drain]

Each fn is ``fn(spark, sf_dir) -> DataFrame``; timing is the noop-sink
materialization (full-plan compute, no sink cost). Runs A,B,A,B,...
``reps`` times each (default 5) after one untimed warmup of each, and
prints per-rep seconds + median ratio B/A.

Default semantics are WARM — session memos/checkpoints populated by
the warmup persist across reps, exactly like bench.py's best-of-2
(which never drains between queries, so its picked sample is the warm
one). That means a candidate whose win is "hit the session memo"
shows its warm-path ratio here, not the cost of a fresh driver
invocation. Pass ``--drain`` to drain_session after EVERY run
(warmups included): each rep then rebuilds memos/checkpoints from the
parquet inputs — the cold path, and the mode that keeps executor
storage flat over many reps.
"""

from __future__ import annotations

import importlib
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eye_of_sauron_spark.session import get_spark  # noqa: E402


def _resolve(spec: str):
    mod, fn = spec.rsplit(":", 1)
    return getattr(importlib.import_module(mod), fn)


def _run(fn, spark, sf_dir, group: str | None = None) -> tuple[float, int]:
    """Returns (seconds, n_jobs). Job count via a unique job group is
    deterministic — the noise-free signal when the host window drifts
    (fixed-cost queries are job/stage-count bound)."""
    if group:
        spark.sparkContext.setJobGroup(group, group)
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    n_jobs = -1
    if group:
        tracker = spark.sparkContext._jsc.sc().statusTracker()
        n_jobs = len(tracker.getJobIdsForGroup(group))
        spark.sparkContext.setJobGroup(f"{group}-done", "")
    return dt, n_jobs


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--drain"]
    drain = "--drain" in sys.argv[1:]
    fa, fb = _resolve(args[0]), _resolve(args[1])
    reps = int(args[2]) if len(args) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_time")
    if drain:
        from eye_of_sauron_spark.functions.materialize import drain_session
    else:
        def drain_session(_spark):  # warm mode: memos persist, like bench.py
            return None
    _run(fa, spark, sf_dir)
    drain_session(spark)
    _run(fb, spark, sf_dir)
    drain_session(spark)
    ta, tb = [], []
    ja = jb = -1
    for i in range(reps):
        t, ja = _run(fa, spark, sf_dir, f"A-{i}")
        ta.append(t)
        drain_session(spark)
        t, jb = _run(fb, spark, sf_dir, f"B-{i}")
        tb.append(t)
        drain_session(spark)
    print("A:", " ".join(f"{t:.3f}" for t in ta),
          f" median {statistics.median(ta):.3f}  jobs {ja}")
    print("B:", " ".join(f"{t:.3f}" for t in tb),
          f" median {statistics.median(tb):.3f}  jobs {jb}")
    print(
        f"median ratio B/A: {statistics.median(tb) / statistics.median(ta):.3f}; "
        f"pairwise median {statistics.median([b / a for a, b in zip(ta, tb)]):.3f}"
    )


if __name__ == "__main__":
    main()
