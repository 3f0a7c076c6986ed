#!/usr/bin/env python
"""Host-window sentinel probe (SCALE.md 'Benchmark adjudication').

Times four code-stable queries (unchanged since r09) at sf0.1 against
their all-time quiet-window bands. When they read above band while the
guest sits idle, the host is in a degraded window: do NOT ship or
solo-re-time a bench into it — keep probing and re-take the WHOLE
bench when the sentinels return to band (>=2/4 in-band, rest near
band, was the shipping condition of rounds 13-14). Bursts can hit a
run while its own sentinel rows stay clean, so judge a candidate run
by its MEDIAN unchanged-row ratio vs the prior shipped file too.

    python tools/sentinel_probe.py            # one probe
    python tools/sentinel_probe.py --loop 360 # probe forever, sleep N s
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (query, quiet-window band in seconds: r09-r13 history at sf0.1)
BANDS = {
    "pricing_summary": (0.26, 0.33),
    "stats_acctbal_by_nation": (0.13, 0.21),
    "join_revenue_by_priority": (0.46, 0.59),
    "dedup_exact_keep_first": (0.24, 0.30),
}


def probe(spark, queries, sf_dir: str) -> int:
    in_band = 0
    for name, (lo, hi) in BANDS.items():
        ts = []
        for _ in range(4):
            t = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(time.perf_counter() - t)
        med = statistics.median(ts[1:])  # drop the cold sample
        ok = med <= hi * 1.15
        in_band += ok
        print(
            f"{med:6.3f}s band({lo:.2f}-{hi:.2f}) "
            f"{'IN-BAND' if ok else 'ABOVE'}  {name}",
            flush=True,
        )
    print(f"{in_band}/4 in-band", flush=True)
    return in_band


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--loop",
        type=int,
        default=0,
        metavar="SECONDS",
        help="probe forever, sleeping N seconds between probes "
        "(default: one probe and exit)",
    )
    args = ap.parse_args()
    sleep_s = args.loop
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from eye_of_sauron_spark import plans
    from eye_of_sauron_spark.functions.materialize import drain_session
    from eye_of_sauron_spark.session import get_spark

    spark = get_spark("sentinel-probe")
    queries = plans.all_queries()
    # warm the scan path so JVM startup is not read as host noise
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").write.format(
        "noop"
    ).mode("overwrite").save()
    while True:
        print(f"=== {time.strftime('%H:%M:%S')}", flush=True)
        probe(spark, queries, sf_dir)
        if not sleep_s:
            return 0
        # hygiene: a long-lived probe loop must not accumulate session
        # state (checkpoint memos etc.) between probes (r14 ADVICE)
        drain_session(spark)
        time.sleep(sleep_s)


if __name__ == "__main__":
    raise SystemExit(main())
