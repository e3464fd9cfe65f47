"""Stream-stream interval join (SURVEY.md §2.9 streaming intent,
extended): correlate two live event streams on a key within an
event-time window — clicks to the purchases they led to, requests to
responses, spans to their children.

Structured Streaming requires exactly what makes this 100 TB-safe:
watermarks on BOTH sides plus a time-range join condition, so each
side's join state is evictable — a click older than
(purchase watermark - upper bound) can never match a future purchase
and is dropped from the state store. Without the range condition the
state grows without bound; this module refuses to build such a join.

State is hash-partitioned by the join key across executors (same
scaling story as any stateful operator). Inner joins emit matches as
they form; the optional outer variants emit the unmatched side only
once its watermark passes (late data accounting).

Outer-join caveat (observed on this Spark line, pinned by
tests/test_streaming.py): the two legs must come from DISTINCT
sources. Filtering ONE stream into both legs (a self-join) couples
the legs' watermarks and the unmatched-side rows never flush; inner
joins are unaffected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: tuple[str, str],
    ts: tuple[str, str],
    upper: str = "30 minutes",
    watermark_delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two watermarked streams on ``key`` where the right event
    falls in ``[left_ts, left_ts + upper]``.

    ``key``/``ts`` are (left_col, right_col) name pairs and must
    differ between the sides (rename upstream), so the range
    condition is expressible without ambiguity.
    """
    lk, rk = key
    lts, rts = ts
    if lk == rk or lts == rts:
        raise ValueError(
            "left/right key and timestamp column names must differ "
            f"(got key={key}, ts={ts}) — rename one side upstream"
        )
    lw = left.withWatermark(lts, watermark_delay)
    rw = right.withWatermark(rts, watermark_delay)
    cond = (
        (F.col(lk) == F.col(rk))
        & (F.col(rts) >= F.col(lts))
        & (F.col(rts) <= F.col(lts) + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond, how)


def enrich_stream_static(
    stream_df: DataFrame,
    dim_df: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to a
    live stream (user profile onto events, product metadata onto
    orders) — the most common streaming join in practice.

    Unlike stream-stream joins this needs NO watermark and keeps NO
    join state: the static side is re-planned each micro-batch and
    broadcast (pinned here — dimensions are the canonical broadcast
    case; a dimension too big to broadcast belongs in a stream-stream
    or lookup design instead), so the stream side is map-only.
    """
    return stream_df.join(F.broadcast(dim_df), on=on, how=how)
