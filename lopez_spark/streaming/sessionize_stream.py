"""Stateful streaming sessionization (custom stateful operator, built
on ``applyInPandasWithState``).

The batch counterpart is the ``events_sessionize`` query (lag + running
sum).  Streaming needs explicit state: one open session per user,
extended by events within the inactivity gap, CLOSED — and emitted —
either by an event that jumps past the gap or by the event-time
watermark passing ``session_end + gap`` (EventTimeTimeout), which is
how late data is bounded.  State per key is three scalars; the operator
scales by hash-partitioning on user_id like any grouped aggregation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id bigint, session_start bigint, session_end bigint, n_events bigint"
STATE_SCHEMA = "start bigint, end bigint, n bigint"


def sessionize_stream(events: DataFrame, gap_seconds: int = 1800, watermark: str = "10 minutes") -> DataFrame:
    """events(user_id, ts timestamp, event_id) — streaming DataFrame →
    closed sessions (user_id, session_start/end epoch-seconds, n_events).

    A session closes when (a) a new event for the user arrives more
    than ``gap_seconds`` after the session's last event, or (b) the
    watermark passes ``session_end + gap_seconds`` (timeout — handles
    users who simply stop)."""

    def fn(key: tuple, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "session_start": [start],
                 "session_end": [end], "n_events": [n]}
            )
            return

        ts = []
        for pdf in pdfs:
            ts.extend(int(t) for t in pdf["ts"].astype("int64") // 1_000_000_000)
        ts.sort()
        closed = []
        start, end, n = state.get if state.exists else (0, 0, 0)  # n==0: no session
        for t in ts:
            if n == 0:
                start, end, n = t, t, 1
            elif t - end > gap_seconds:
                closed.append((start, end, n))
                start, end, n = t, t, 1
            else:
                end = max(end, t)
                n += 1
        state.update((start, end, n))
        state.setTimeoutTimestamp((end + gap_seconds) * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_py(rows: list[tuple[int, int]], gap_seconds: int = 1800) -> dict[int, list[tuple[int, int, int]]]:
    """Oracle: (user_id, epoch_ts) rows → ALL sessions per user (incl.
    the final unclosed one) as (start, end, n)."""
    by_user: dict[int, list[int]] = {}
    for u, t in rows:
        by_user.setdefault(u, []).append(t)
    out: dict[int, list[tuple[int, int, int]]] = {}
    for u, ts in by_user.items():
        ts.sort()
        sessions = []
        start = end = ts[0]
        n = 1
        for t in ts[1:]:
            if t - end > gap_seconds:
                sessions.append((start, end, n))
                start = end = t
                n = 1
            else:
                end = t
                n += 1
        sessions.append((start, end, n))
        out[u] = sessions
    return out
