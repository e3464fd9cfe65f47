"""Sketch-family guarantees: error bounds vs exact counts, and the
merge identity that makes stored HLL rollups answer coarser queries
without re-scanning facts."""

from pyspark.sql import functions as F

from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators import (
    sketches as SK,
)


def _facts(spark):
    # 3 days x 1000 users with overlap across days
    rows = [
        (d, u)
        for d in range(3)
        for u in range(d * 300, d * 300 + 1000)
    ]
    return spark.createDataFrame(rows, "day int, user_id long")


def test_approx_distinct_within_rsd(spark):
    df = _facts(spark)
    exact = {r.day: r.n for r in df.groupBy("day").agg(
        F.countDistinct("user_id").alias("n")).collect()}
    got = {r.day: r.approx_distinct for r in SK.approx_distinct_rollup(
        df, "user_id", ["day"], rsd=0.02).collect()}
    for day, n in exact.items():
        assert abs(got[day] - n) / n < 0.1  # 5 sigma of rsd=2%


def test_hll_rollup_merges_without_rescan(spark):
    df = _facts(spark)
    sketches = SK.hll_rollup(df, "user_id", ["day"]).persist()
    assert sketches.count() == 3

    # mergeability: the global estimate from stored per-day sketches
    # tracks the direct-over-facts estimate (the Datasketches union
    # gadget may differ by a hair — both must sit inside HLL error
    # bounds of each other and of the truth)
    merged = SK.hll_merge(sketches, []).collect()[0]["approx_distinct"]
    direct = df.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(12))
        ).alias("e")
    ).collect()[0]["e"]
    assert abs(merged - direct) / direct < 0.05

    # and the estimate is in bounds of the true global distinct count
    true_n = df.select("user_id").distinct().count()  # 1600
    assert abs(merged - true_n) / true_n < 0.1

    # coarser-key merge keeps per-group answers in bounds too
    with_parity = sketches.withColumn("parity", F.col("day") % 2)
    by_parity = {r.parity: r.approx_distinct
                 for r in SK.hll_merge(with_parity, ["parity"]).collect()}
    exact_parity = {
        r.parity: r.n
        for r in df.withColumn("parity", F.col("day") % 2)
        .groupBy("parity").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    for p, n in exact_parity.items():
        assert abs(by_parity[p] - n) / n < 0.1
    sketches.unpersist()


def test_approx_quantiles_bounds(spark):
    df = spark.range(0, 10_000).select(
        (F.col("id") % 2).alias("g"), F.col("id").cast("double").alias("v")
    )
    out = {r.g: r.quantiles for r in SK.approx_quantiles(
        df, "v", ["g"], probs=[0.5, 0.99]).collect()}
    for g in (0, 1):
        p50, p99 = out[g]
        assert abs(p50 - 5000) < 200
        assert abs(p99 - 9900) < 200
