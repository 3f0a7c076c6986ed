"""Stateful per-key ordered-reassembly buffer (reference A11).

The reference restores per-camera frame order after parallel
consumers scramble it: a min-heap of frame numbers plus a payload
dict per camera, popped once the buffer fills (src/utils.py:139-191,
95-135). That implementation never evicts consumed entries
(utils.py:50, 168 — an unbounded leak) and paces emission with
wall-clock sleeps.

Here the same semantics are a keyed stateful streaming operator via
``applyInPandasWithState``:

- state per camera = (next expected frame, pending out-of-order
  frames); entries are REMOVED on emit — state size is bounded by the
  disorder, not the stream length;
- frames are emitted exactly in frame_num order; a gap stalls its
  camera until the missing frame arrives or the pending buffer
  exceeds ``buffer_size``, at which point the operator skips forward
  to the smallest buffered frame (the reference's fixed-size-heap
  behavior when a frame is lost); frames arriving BEHIND the emit
  point after such a skip are stale and dropped (watermark-style), so
  the output is strictly increasing per camera under every arrival
  order — property-tested in tests/test_properties.py;
- scale: state is per-key and the operator shuffles once on camera;
  1000 cameras on 1000 executors hold one tiny heap each. This is the
  one operator Spark has no built-in for (SURVEY.md §4).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "camera INT, frame_num INT, payload STRING"
STATE_SCHEMA = (
    "next_expected INT, pending_nums ARRAY<INT>, pending_payloads ARRAY<STRING>"
)


def make_reorder_fn(buffer_size: int = 64):
    """Build the per-group stateful function (picklable closure)."""

    def reorder(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (camera,) = key
        if state.exists:
            next_expected, nums, payloads = state.get
            pending = dict(zip(nums, payloads))
        else:
            next_expected, pending = 0, {}

        for pdf in pdfs:
            for frame_num, payload in zip(pdf["frame_num"], pdf["payload"]):
                # frames behind the emit point are STALE (we already
                # skipped past them on overflow) — drop them, like
                # watermark late-data: emitted order stays strictly
                # increasing and state cannot resurrect old frames
                if int(frame_num) >= next_expected:
                    pending[int(frame_num)] = payload

        out_nums: list[int] = []
        out_payloads: list[str] = []

        def drain(start: int) -> int:
            n = start
            while n in pending:
                out_nums.append(n)
                out_payloads.append(pending.pop(n))  # evict on emit
                n += 1
            return n

        next_expected = drain(next_expected)
        while len(pending) > buffer_size:
            # buffer overflow: skip the gap to the smallest buffered
            # frame, like the reference's bounded heap under frame loss
            next_expected = drain(min(pending))

        state.update(
            (next_expected, list(pending.keys()), list(pending.values()))
        )
        if out_nums:
            yield pd.DataFrame(
                {
                    "camera": camera,
                    "frame_num": out_nums,
                    "payload": out_payloads,
                }
            )

    return reorder


def reorder_stream(frames: DataFrame, buffer_size: int = 64) -> DataFrame:
    """Apply the reorder buffer to a streaming DataFrame with columns
    (camera INT, frame_num INT, payload STRING)."""
    return frames.groupBy("camera").applyInPandasWithState(
        make_reorder_fn(buffer_size),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
