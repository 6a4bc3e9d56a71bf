"""Stateful streaming sessionization — `applyInPandasWithState`.

The batch twin is the `session_window_1h` contract query
(`F.session_window`, gap = 1 h). The reference groups turns into
conversations statically at ingest (`/root/reference/visionsearch/
conversation/models.py` — a conversation row plus per-turn rows keyed to
it); this operator is the streaming form of that grouping: per-user gap
sessions over an unbounded event stream, with event-time timeout closing
a session once the watermark passes `last_ts + gap`.

Semantics match `F.session_window` exactly when each user's events
arrive in event-time order across micro-batches (the spool/ingest path
writes chronological chunks, and the watermark bounds disorder within a
batch): a session is [start, last + gap); an event at exactly
`last + gap` starts a NEW session (window end is exclusive). Late
in-watermark events are folded conservatively (they extend the open
session backwards but cannot re-split already-emitted sessions — the
standard streaming-sessionization trade, same as Spark's own streaming
session_window in update mode).

State per user is three int64s (session_start, last_ts, n) — O(active
users), not O(events); at 100 TB the state store shards by user across
executors and each micro-batch shuffles only its delta.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_DDL = "user_id long, session_start long, n_events long"
STATE_DDL = "session_start long, last_ts long, n long"


def _fold_sessions(
    ts_us: list[int], gap_us: int, state: tuple[int, int, int] | None
) -> tuple[list[tuple[int, int]], tuple[int, int, int] | None]:
    """Pure fold: new event times (sorted ascending, epoch-us) + open
    session state -> (closed sessions as (session_start, n), new state).
    Unit-tested directly against F.session_window."""
    closed: list[tuple[int, int]] = []
    if state is None:
        ss = lt = None
        n = 0
    else:
        ss, lt, n = state
    for t in ts_us:
        t = int(t)
        if lt is None:
            ss, lt, n = t, t, 1
        elif t - lt >= gap_us:
            closed.append((ss, n))
            ss, lt, n = t, t, 1
        else:
            n += 1
            lt = max(lt, t)
            if t < ss:
                ss = t  # late in-watermark event extends the session back
    return closed, (None if lt is None else (int(ss), int(lt), int(n)))


def sessionize_stream(
    events: DataFrame,
    gap_sec: int = 3600,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """events: STREAMING DataFrame with (user_id long, ts timestamp).
    Returns a streaming DataFrame (user_id, session_start epoch-us,
    n_events), one row per CLOSED session — closed by an in-stream gap or
    by event-time timeout when the watermark passes last_ts + gap."""
    gap_us = int(gap_sec) * 1_000_000

    def fn(key, pdfs, state: GroupState):
        (user,) = key
        if state.hasTimedOut:
            ss, lt, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user], "session_start": [ss], "n_events": [n]}
            )
            return
        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(pdf[ts_col].astype("int64") // 1000)
        ts.sort()
        prev = state.get if state.exists else None
        closed, nxt = _fold_sessions(ts, gap_us, prev)
        if nxt is not None:
            state.update(nxt)
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(nxt[1] // 1000 + gap_sec * 1000,
                                          wm_ms + 1))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "n_events": [c[1] for c in closed],
                }
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn, OUT_DDL, STATE_DDL, "append", GroupStateTimeout.EventTimeTimeout
        )
    )
