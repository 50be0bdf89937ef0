"""Streaming gap-based sessionization — a custom stateful operator on
``applyInPandasWithState``.

The batch twin lives in operators/events.sessionize (window compose);
streams need explicit keyed state because a session can span
micro-batches: per user we hold the open session (start, end, count) in
group state, close it when a gap larger than ``gap_minutes`` arrives or
the user goes idle (processing-time timeout), and emit closed sessions
downstream. This is the engine's demonstration of Spark's
arbitrary-stateful-processing surface (SURVEY.md §2.5): Arrow-batched
per-group pandas, bounded state (3 scalars per live user), at-least-once
emission made idempotent downstream by (user_id, session_start) keys.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long"
)
STATE_SCHEMA = "start long, end long, n long"
_US = 1_000_000


def _session_fn(gap_minutes: int, idle_timeout_ms: int | None):
    gap_us = gap_minutes * 60 * _US

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(end, unit="us")],
                    "n_events": [n],
                }
            )
            return
        ts = sorted(
            int(t.value // 1000)  # pandas ns -> us
            for pdf in pdfs
            for t in pd.to_datetime(pdf["ts"])
        )
        if not ts:
            return
        cur = list(state.get) if state.exists else None
        closed: list[tuple[int, int, int]] = []
        for t in ts:
            if cur is None:
                cur = [t, t, 0]
            elif t - cur[1] > gap_us:
                closed.append(tuple(cur))
                cur = [t, t, 0]
            cur[1] = max(cur[1], t)
            cur[2] += 1
        state.update(tuple(cur))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming DataFrame (user_id, ts, ...) -> closed sessions.

    ``idle_timeout_ms=None`` (bounded/batch-style runs, availableNow):
    open sessions simply remain in state — the query terminates when the
    input is drained. Set a timeout for CONTINUOUS operation (processing-
    time trigger): idle users' open sessions flush after the timeout.
    Note availableNow + a processing-time timeout spins micro-batches
    until every timeout expires — use the pairings above.
    """
    src = events.select(
        events[user_col].alias("user_id"), events[ts_col].alias("ts")
    )
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_minutes, idle_timeout_ms),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
