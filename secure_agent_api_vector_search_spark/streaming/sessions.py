"""Custom stateful streaming operator ([EXT], SURVEY.md §2.9):
per-user sessionization via ``applyInPandasWithState``.

Batch twin: operators/analytics.py::events_sessionize — the streaming
fold maintains (last event time, event count, session count) per user
across micro-batches and converges to the batch answer whenever each
user's events arrive time-ordered across batches (the standard
replay/backfill regime). Out-of-order arrival WITHIN a micro-batch is
handled (rows are sorted before the fold); arrival out of order ACROSS
batches is the classic streaming-sessionization limit — state keeps
only the last timestamp, so a truly late event would need watermarked
re-sessionization downstream.

State is O(1) per user (three int64s) — the 100 TB shape: state scales
with |users|, never |events|; the shuffle key is the state key.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, n_sessions long"
STATE_SCHEMA = "last_us long, n_events long, n_sessions long"


def _fold(gap_us: int):
    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        rows = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        # datetime64 -> integer microseconds (matches unix_micros in the
        # batch twin), sorted within the micro-batch
        ts = (rows["ts"].astype("datetime64[us]").astype("int64")).sort_values().to_numpy()
        if state.exists:
            last_us, n_events, n_sessions = state.get
        else:
            last_us, n_events, n_sessions = None, 0, 0
        for t in ts:
            if last_us is None:
                n_sessions = 1
            elif t - last_us > gap_us:
                n_sessions += 1
            n_events += 1
            last_us = int(t)
        state.update((last_us, n_events, n_sessions))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n_events], "n_sessions": [n_sessions]}
        )

    return fn


def sessionize_stream(stream: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Streaming per-user session counts: a session break is a gap >
    ``gap_minutes`` since the user's previous event. Emits the updated
    (user_id, n_events, n_sessions) row for every user seen in each
    micro-batch (update output mode)."""
    gap_us = gap_minutes * 60 * 1_000_000
    return (
        stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _fold(gap_us),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
