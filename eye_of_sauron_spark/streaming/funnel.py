"""Stateful streaming funnel: per-user ordered view -> click ->
purchase progress as an ``applyInPandasWithState`` operator.

The batch funnel (plans/window.py::funnel_counts) computes ordered
reachability with chained cumulative windows; streaming cannot window
backwards over an unbounded past, so the same semantics become a
per-user 3-bit state machine — the streaming form of the reference's
first-match state (src/prediction_producer.py:321-323): a stage
completion is emitted exactly once, the first time the ordered
subsequence reaches it.

Scale: state is 3 ints per user, shuffled once on user_id, and NEVER
grows with stream length; emission is at most 3 rows per user ever.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id LONG, stage STRING"
STATE_SCHEMA = "seen_view INT, seen_click INT, seen_purchase INT"


def funnel_progress(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Advance one user's funnel over a micro-batch (rows may arrive
    unsorted WITHIN the batch — sorted here on (ts, event_id), the
    same total order the batch funnel's windows use)."""
    (user_id,) = key
    v, c, p = state.get if state.exists else (0, 0, 0)
    out: list[str] = []
    batches = list(pdfs)
    if batches:
        rows = pd.concat(batches).sort_values(["ts", "event_id"])
        for et in rows["event_type"]:
            if et == "view" and not v:
                v = 1
                out.append("1_view")
            elif et == "click" and v and not c:
                c = 1
                out.append("2_click")
            elif et == "purchase" and c and not p:
                p = 1
                out.append("3_purchase")
    state.update((v, c, p))
    if out:
        yield pd.DataFrame({"user_id": user_id, "stage": out})


def funnel_stream(events: DataFrame) -> DataFrame:
    """Apply the funnel state machine to a streaming DataFrame with
    columns (user_id LONG, ts TIMESTAMP, event_id LONG,
    event_type STRING)."""
    return events.groupBy("user_id").applyInPandasWithState(
        funnel_progress,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
