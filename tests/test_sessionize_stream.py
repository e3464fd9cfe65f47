"""Stateful streaming sessionization (applyInPandasWithState): both
closure paths are exercised — sessions closed by event-time gaps
inside a batch, and open sessions flushed by the wall-clock
ProcessingTimeTimeout.

Round-3 note: the container's Spark build now runs
applyInPandasWithState cleanly (the r1/r2 planner NPE is gone), so
the old file-level skip is lifted. One quirk remains upstream:
``availableNow`` never self-terminates while a ProcessingTimeTimeout
is registered (the trigger loops on "cleaning up state"), so the test
polls the sink for the expected rows and then stops the query instead
of awaiting termination.
"""

import datetime as dt
import json
import time

from medallion_architecture_using_apache_iceberg_table_buckets_spark.streaming.sessionize import (
    sessionize_stream,
)


def test_stream_sessionize_gap_and_timeout_closure(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(uid, seconds, eid):
        return (uid, t0 + dt.timedelta(seconds=seconds), eid)

    # gap_seconds=5: seconds-scale event-time gaps close sessions
    # in-batch; the 5s wall-clock timeout then flushes the still-open
    # tail sessions within the test's polling window.
    rows = [
        # user 1: session 0 (3 events, 0-4s), session 1 (2 events,
        # 60-62s), session 2 open (200s)
        ev(1, 0, 1), ev(1, 2, 2), ev(1, 4, 3),
        ev(1, 60, 4), ev(1, 62, 5),
        ev(1, 200, 6),
        # user 2: single open session
        ev(2, 0, 7),
    ]
    src = tmp_path / "src"
    src.mkdir()
    with open(src / "batch.json", "w") as f:
        for uid, ts, eid in rows:
            f.write(
                json.dumps(
                    {"user_id": uid, "ts": ts.isoformat(), "event_id": eid}
                )
                + "\n"
            )

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long")
        .json(str(src))
    )
    out = sessionize_stream(stream, gap_seconds=5)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        deadline = time.time() + 120
        got = {}
        while time.time() < deadline:
            if q.exception() is not None:
                raise AssertionError(f"stream died: {q.exception()}")
            got = {
                (r["user_id"], r["session_id"]): (
                    r["n_events"],
                    r["session_start"],
                    r["session_end"],
                )
                for r in spark.sql("SELECT * FROM sessions").collect()
            }
            if len(got) >= 4:
                break
            time.sleep(1)
    finally:
        if q.isActive:
            q.stop()

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    # in-batch gap closures
    assert got[(1, 0)] == (3, at(0), at(4))
    assert got[(1, 1)] == (2, at(60), at(62))
    # wall-clock timeout flushes of the open sessions
    assert got[(1, 2)] == (1, at(200), at(200))
    assert got[(2, 0)] == (1, at(0), at(0))
    assert len(got) == 4
