"""Range (interval) join: points-to-intervals without a nested loop.

Open-source Spark plans a pure inequality join as
BroadcastNestedLoopJoin — O(|points| * |intervals|) evaluated pairs,
a scale-killer the moment neither side broadcasts. The standard fix
(used by every production time-series engine) is BIN BUCKETING: slice
time into fixed-width buckets, replicate each interval into every
bucket it overlaps, tag each point with its single containing bucket,
then EQUI-join on (keys..., bucket) and re-check the exact range on
the (tiny) candidate set.

Cost model at 100 TB: the join becomes a hash/sort-merge equi-join
whose fan-out is |intervals| * (len/width + 1) replicas — pick
``bucket_width_s`` on the order of the typical interval length and
the blow-up is ~2x, while candidates per point drop from |intervals|
to the handful sharing its bucket. No pair can match in more than one
bucket (a point lives in exactly one), so no dedup pass is needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join_points(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    keys: list[str] | None = None,
    bucket_width_s: int = 7200,
) -> DataFrame:
    """Join each point to every interval containing it.

    points[point_ts] is a timestamp; intervals[start_col, end_col]
    are inclusive timestamp bounds. ``keys`` are additional equi-join
    columns (present on both sides). Returns points.* joined to
    intervals.* for every (point, interval) pair with
    start <= ts <= end and matching keys.

    Bucketing is floor(epoch_seconds / width): a point's bucket
    always lies in [bucket(start), bucket(end)] when the point is in
    range (epoch flooring is monotone), so replicating intervals over
    that closed bucket span loses no pair.
    """
    keys = keys or []
    w = F.lit(bucket_width_s)

    def _bkt(c: Column) -> Column:
        return F.floor(c.cast("long") / w).cast("long")

    p = points.withColumn("_bkt", _bkt(F.col(point_ts)))
    i = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(_bkt(F.col(start_col)), _bkt(F.col(end_col)))
        ),
    )
    joined = p.join(i, keys + ["_bkt"]).filter(
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) <= F.col(end_col))
    )
    return joined.drop("_bkt")
