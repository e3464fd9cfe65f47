"""Bucketed interval join (operators/interval.py): the bucket
rewrite must produce EXACTLY the pairs of the naive cross-join
filter — closed bounds, intervals spanning many buckets, points on
bucket edges, keyed and keyless — with each pair emitted once."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.interval import (
    range_join_points,
)

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _mk(spark):
    pts = spark.createDataFrame(
        [
            # on the exact start bound (closed: must match i1)
            (1, "a", T0),
            # interior of i1, also inside i2's long span
            (2, "a", T0 + timedelta(minutes=90)),
            # on the exact end bound of i1 (closed: must match)
            (3, "a", T0 + timedelta(hours=2)),
            # 1 microsecond past i1's end (must NOT match i1)
            (4, "a", T0 + timedelta(hours=2, microseconds=1)),
            # far future: matches only i2's 3-day window
            (5, "b", T0 + timedelta(days=2)),
            # before everything
            (6, "a", T0 - timedelta(seconds=1)),
        ],
        ["pid", "k", "ts"],
    )
    iv = spark.createDataFrame(
        [
            # 2-hour window = 1 bucket span at width 7200
            (10, "a", T0, T0 + timedelta(hours=2)),
            # 3-DAY window: replicates into ~37 buckets at width 7200
            (11, "b", T0, T0 + timedelta(days=3)),
            # zero-length interval exactly on point 3's ts
            (12, "a", T0 + timedelta(hours=2), T0 + timedelta(hours=2)),
        ],
        ["iid", "k", "ws", "we"],
    )
    return pts, iv


def _naive(pts, iv, keyed: bool):
    return {
        (r["pid"], r["iid"])
        for r in pts.crossJoin(
            iv.select(
                F.col("iid"), F.col("k").alias("ik"), F.col("ws"), F.col("we")
            )
        )
        .filter(
            (F.col("ts") >= F.col("ws"))
            & (F.col("ts") <= F.col("we"))
            & (F.lit(not keyed) | (F.col("k") == F.col("ik")))
        )
        .select("pid", "iid")
        .collect()
    }


def test_keyless_matches_cross_join(spark):
    pts, iv = _mk(spark)
    got = range_join_points(
        pts, iv.select("iid", "ws", "we"), "ts", "ws", "we",
        keys=None, bucket_width_s=7200,
    )
    pairs = [(r["pid"], r["iid"]) for r in got.select("pid", "iid").collect()]
    # exactly once per pair
    assert len(pairs) == len(set(pairs))
    assert set(pairs) == _naive(pts, iv, keyed=False)
    # the closed-bound edges specifically
    assert (1, 10) in pairs and (3, 10) in pairs and (3, 12) in pairs
    assert (4, 10) not in pairs and (6, 10) not in pairs


def test_keyed_matches_cross_join(spark):
    pts, iv = _mk(spark)
    got = range_join_points(
        pts, iv, "ts", "ws", "we", keys=["k"], bucket_width_s=7200,
    )
    pairs = {(r["pid"], r["iid"]) for r in got.select("pid", "iid").collect()}
    assert pairs == _naive(pts, iv, keyed=True)
    # key mismatch excludes point 5 ("b") from "a" intervals even in range
    assert (2, 11) not in pairs


def test_tiny_bucket_width_still_exact(spark):
    """Width much smaller than the intervals (max replication) must
    not duplicate or lose pairs."""
    pts, iv = _mk(spark)
    got = range_join_points(
        pts, iv.select("iid", "ws", "we"), "ts", "ws", "we",
        keys=None, bucket_width_s=60,
    )
    pairs = [(r["pid"], r["iid"]) for r in got.select("pid", "iid").collect()]
    assert len(pairs) == len(set(pairs))
    assert set(pairs) == _naive(pts, iv, keyed=False)
