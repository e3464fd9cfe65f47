"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` — the Structured Streaming form of
operators/relational.py:sessionize_events.

State per user: (open-session id, start, last-seen, event count).
Each micro-batch folds its events into the state; a session is
emitted when a gap exceeds the threshold (the previous session
closes) or when the state times out after inactivity. This is the
operator shape (Arrow-batched per-group state updates) a real
pipeline uses for sessions, funnels, and CDC-order repair at scale:
state lives in the state store, partitioned by the grouping key, so
1000 executors each hold their key range.

Note: the fold function is defined as a closure inside
``sessionize_stream`` so cloudpickle ships it by value — Python
workers do not have this package on their import path.

Verified live (round 3): the container's Spark build now runs
``applyInPandasWithState`` end-to-end, and
tests/test_sessionize_stream.py exercises both closure paths (event
-time gaps in-batch, wall-clock timeout flush of open sessions)
against a real streaming query. Remaining upstream quirk: a query
with a registered ProcessingTimeTimeout never self-terminates under
``availableNow`` (loops on "cleaning up state"), so callers using
one-shot triggers should poll-and-stop rather than awaitTermination.
The batch twin (operators/relational.py:sessionize_events) stays the
oracle-checked reference for the session semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

SESSION_GAP_SECONDS = 1800

OUTPUT_SCHEMA = (
    "user_id long, session_id long, n_events long, "
    "session_start timestamp, session_end timestamp"
)
STATE_SCHEMA = "session_id long, n_events long, start_s long, last_s long"


def sessionize_stream(
    events_stream: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS
) -> DataFrame:
    """events (user_id, ts, event_id) stream -> closed-session stream."""
    import pandas as pd  # noqa: F401 (captured into the closure)

    def fold(key, pdfs, state):
        import pandas as pd

        (user_id,) = key

        def emit(closed):
            return pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_id": [c[0] for c in closed],
                    "n_events": [c[1] for c in closed],
                    "session_start": [pd.Timestamp(c[2], unit="s") for c in closed],
                    "session_end": [pd.Timestamp(c[3], unit="s") for c in closed],
                }
            )

        if state.hasTimedOut:
            session_id, n, start_s, last_s = state.get
            state.remove()
            yield emit([(session_id, n, start_s, last_s)])
            return

        events = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        ts_s = (events["ts"].astype("int64") // 1_000_000_000).tolist()

        session_id, n, start_s, last_s = (
            state.get if state.exists else (0, 0, None, None)
        )
        closed = []
        for t in ts_s:
            if last_s is not None and t - last_s > gap_seconds:
                closed.append((session_id, n, start_s, last_s))
                session_id, n, start_s = session_id + 1, 0, None
            if start_s is None:
                start_s = t
            n += 1
            last_s = t
        state.update((session_id, n, start_s, last_s))
        state.setTimeoutDuration(gap_seconds * 1000)
        if closed:
            yield emit(closed)

    return (
        events_stream.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
