"""Event-time windowed aggregation with watermarked late-data
handling — the Structured Streaming counterpart of the batch
``events_daily_summary`` rollup (SURVEY.md §2.9 streaming intent).

``windowed_event_counts`` declares the plan: event-time tumbling (or
sliding) windows over a file-sourced stream, with a watermark bounding
how late an event may arrive and still update its window. State is
keyed by (window, group key) in the state store, so on a real cluster
every executor holds only its key range and the watermark lets Spark
evict closed windows — bounded state at unbounded input, which is the
entire point at 100 TB/day.

``run_windowed_counts`` executes it with Trigger.AvailableNow in
update mode against a memory sink: each invocation drains the new
files, emits only the windows the batch changed, and persists the
watermark in the checkpoint — so a *later* invocation drops events
older than (max event time seen - delay), which the test asserts.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    win = (
        F.window(ts_col, window_duration, slide)
        if slide
        else F.window(ts_col, window_duration)
    )
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(win.alias("w"), group_col)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4).alias(
                "sum_value"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            group_col,
            "n_events",
            "sum_value",
        )
    )


def run_windowed_counts(
    spark: SparkSession,
    input_dir: str | Path,
    schema: T.StructType,
    checkpoint_dir: str | Path,
    sink,
    **window_kwargs,
) -> None:
    """Drain available files through the windowed aggregation
    (Trigger.AvailableNow, update output mode). ``sink(batch_df,
    batch_id)`` receives each micro-batch's updated window rows —
    foreachBatch rather than the memory sink because only foreachBatch
    supports resuming from the checkpoint, and resuming is the whole
    late-data story (the watermark persists there between drains)."""
    src = spark.readStream.schema(schema).parquet(str(input_dir))
    agg = windowed_event_counts(src, **window_kwargs)
    q = (
        agg.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(checkpoint_dir))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
