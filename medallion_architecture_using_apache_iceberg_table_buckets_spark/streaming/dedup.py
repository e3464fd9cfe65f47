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

import warnings

from pyspark.sql import DataFrame


def dedup_stream(
    stream: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark_delay: str = "30 minutes",
    allow_unbounded_state: bool = False,
) -> DataFrame:
    """Watermarked exactly-once dedup on ``keys``.

    On builds without ``dropDuplicatesWithinWatermark`` (pre-3.5)
    the only fallback is plain ``dropDuplicates``, which differs in
    BOTH state growth (keeps every key forever) and semantics (a key
    replayed after the watermark passes is dropped forever, where the
    real operator re-emits it). That silent divergence across Spark
    versions is a correctness trap, so the fallback must be opted
    into explicitly with ``allow_unbounded_state=True``; otherwise a
    ``RuntimeError`` names the missing operator. Even when allowed,
    a warning is emitted.
    """
    s = stream.withWatermark(ts_col, watermark_delay)
    if hasattr(s, "dropDuplicatesWithinWatermark"):
        return s.dropDuplicatesWithinWatermark(list(keys))
    if not allow_unbounded_state:
        raise RuntimeError(
            "dropDuplicatesWithinWatermark is unavailable on this Spark "
            "build (< 3.5); pass allow_unbounded_state=True to accept the "
            "dropDuplicates fallback's unbounded state and "
            "drop-forever-after-watermark semantics"
        )
    warnings.warn(
        "dedup_stream: falling back to unbounded-state dropDuplicates — "
        "keys replayed after the watermark passes are dropped forever, "
        "unlike dropDuplicatesWithinWatermark",
        RuntimeWarning,
        stacklevel=2,
    )
    return s.dropDuplicates(list(keys))
