"""Streaming exactly-once deduplication (SURVEY.md §2.9 streaming
intent: T5 late-update dedup, re-expressed as the Structured
Streaming state-store operator).

``dedup_stream`` declares ``dropDuplicatesWithinWatermark`` over a
watermarked event-time stream: the state store keeps one entry per
key only until the watermark passes it, so at-least-once upstream
delivery (file redelivery, source retries) collapses to exactly-once
rows downstream with BOUNDED state — the unbounded-input guarantee
that a plain ``dropDuplicates`` (which keeps every key forever)
cannot give at 100 TB/day. First occurrence is emitted immediately
(append mode); replays inside the watermark window are dropped.

On a real cluster the state is hash-partitioned by key across
executors, so the dedup scales horizontally with no coordination —
each executor owns its key range's state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    stream: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Watermarked exactly-once dedup on ``keys``.

    Falls back to the unbounded-state ``dropDuplicates`` only on
    builds without ``dropDuplicatesWithinWatermark`` (pre-3.5).
    """
    s = stream.withWatermark(ts_col, watermark_delay)
    if hasattr(s, "dropDuplicatesWithinWatermark"):
        return s.dropDuplicatesWithinWatermark(list(keys))
    return s.dropDuplicates(list(keys))
