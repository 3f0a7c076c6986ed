#!/usr/bin/env python
"""Generate the SURVEY.md §8.1 evidence-ledger bullet lists.

Reads every CORRECTNESS_r*.json (pre-r08 files may nest rows under
"queries"; r08+ are flat), keeps each query's LATEST driver row, and
groups the full registry by that freshness. Output is the markdown
bullet list §8.1 embeds — queries with no driver row yet are listed
separately so the ledger never claims evidence that does not exist.

    python tools/evidence_ledger.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def latest_rows() -> dict[str, int]:
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        d = json.load(open(f))
        if "queries" in d and isinstance(d["queries"], dict):
            d = d["queries"]
        for name in d:
            latest[name] = max(rnd, latest.get(name, 0))
    return latest


def main() -> None:
    from eye_of_sauron_spark import plans

    registered = list(plans.all_queries())
    oracles = plans.all_oracles()
    latest = latest_rows()
    by_round: dict[int, list[str]] = {}
    for name in registered:
        by_round.setdefault(latest.get(name, 0), []).append(name)
    print(
        f"registered: {len(registered)}; with oracle: {len(oracles)}; "
        f"driver rows cover: {sum(len(v) for r, v in by_round.items() if r)}"
    )
    for rnd in sorted(by_round, reverse=True):
        names = sorted(by_round[rnd])
        tag = (
            f"**driver hash-green, last r{rnd:02d}** ({len(names)})"
            if rnd
            else f"**no driver row yet** ({len(names)})"
        )
        print(f"- {tag}: " + ", ".join(f"`{n}`" for n in names))


if __name__ == "__main__":
    main()
