"""Stateful streaming sessionization via ``applyInPandasWithState`` —
the custom-stateful-operator surface of Structured Streaming (the twin of
the batch q41 plan, which uses a sort window; a stream cannot sort the
future, so per-key state carries the open session across micro-batches).

State per user: the OPEN session (start_us, last_ts_us, n_events,
value_cents).  A batch's events for the user are folded in event-time
order; every gap > ``gap_us`` CLOSES the running session (emitted
downstream, append mode) and opens a new one.  The open tail stays in
state and is NOT emitted — closed-session semantics are what make the
operator's output stable under any micro-batch slicing of the same input
(asserted against the batch rule in tests/test_streaming_sessions.py).

Scale shape: state is hash-partitioned by user_id by the engine; each
micro-batch shuffles only its own rows (state is local to the partition),
and the per-group pandas fold is O(events in batch).

State growth: without a TTL, a key that never returns (abandoned user)
holds its open session forever — unbounded state at web scale.  Pass
``idle_timeout_ms`` to switch to ProcessingTimeTimeout: a key idle that
long has its open session FLUSHED as closed and its state removed (the
semantics of "wall-clock idle >> gap" — at any idle_timeout comfortably
above the gap, a flushed session is one the gap rule would eventually
close anyway).  The default stays NoTimeout, where results are a pure
function of the input — the property the equivalence test relies on;
with a TTL the flush depends on processing time, which is exactly why
it is opt-in.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("value_cents", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("value_cents", LongType()),
    ]
)


_OUT_COLS = [
    "user_id",
    "session_start_us",
    "session_end_us",
    "n_events",
    "value_cents",
]


def sessionize_stream(
    events: DataFrame,
    gap_us: int = 1_800_000_000,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """events(user_id long, ts_us long, event_id long, value_cents long),
    streaming -> closed sessions, append mode.  With ``idle_timeout_ms``,
    idle keys flush their open session and free their state (see module
    docstring for the semantics trade)."""

    def fold(key, pdfs, state: GroupState):
        (user_id,) = key
        if idle_timeout_ms is not None and state.hasTimedOut:
            if state.exists:
                start, last, n, cents = state.get
                state.remove()
                if start is not None:
                    yield pd.DataFrame(
                        [(user_id, start, last, n, cents)], columns=_OUT_COLS
                    )
            return
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts_us", "event_id"]
        )
        if state.exists:
            start, last, n, cents = state.get
        else:
            start = None
            last = n = cents = 0
        closed = []
        for ts, v in rows[["ts_us", "value_cents"]].itertuples(index=False):
            ts, v = int(ts), int(v)
            if start is None:
                start, last, n, cents = ts, ts, 1, v
            elif ts - last > gap_us:
                closed.append((user_id, start, last, n, cents))
                start, last, n, cents = ts, ts, 1, v
            else:
                last, n, cents = ts, n + 1, cents + v
        state.update((start, last, n, cents))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        if closed:
            yield pd.DataFrame(closed, columns=_OUT_COLS)

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if idle_timeout_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )
