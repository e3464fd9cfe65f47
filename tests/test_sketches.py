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


def test_theta_set_algebra_exact_on_small(spark):
    # A = users 0..999 (seg "a"), B = users 500..1499 (seg "b"):
    # union 1500, intersection 500, difference (A\B) 500. At this
    # cardinality (< 2^12 nominal entries) theta sketches are in
    # exact mode, so the estimates are not just in-bounds but exact.
    rows = [("a", u) for u in range(1000)] + [("b", u) for u in range(500, 1500)]
    df = spark.createDataFrame(rows, "seg string, user_id long")
    est = SK.theta_set_estimates(
        SK.theta_segment_sketches(df, "user_id", "seg", "a", "b", lg_k=12)
    ).collect()[0]
    assert est["est_union"] == 1500
    assert est["est_intersection"] == 500
    assert est["est_difference"] == 500


def test_theta_set_algebra_bounds_above_nominal(spark):
    # 60k vs 60k with 20k overlap — well above 2^12 nominal entries,
    # so the sketches downsample; estimates must stay inside ~3x the
    # 1/sqrt(2^12) = 1.6% rse of the union for all three operations.
    rows = [("a", u) for u in range(60_000)] + [
        ("b", u) for u in range(40_000, 100_000)
    ]
    df = spark.createDataFrame(rows, "seg string, user_id long")
    est = SK.theta_set_estimates(
        SK.theta_segment_sketches(df, "user_id", "seg", "a", "b", lg_k=12)
    ).collect()[0]
    tol = 0.05 * 100_000
    assert abs(est["est_union"] - 100_000) <= tol
    assert abs(est["est_intersection"] - 20_000) <= tol
    assert abs(est["est_difference"] - 40_000) <= tol


def test_kll_rollup_merge_matches_direct_and_truth(spark):
    # 4 cells x 25k uniform values; merged sketch must agree with a
    # single direct sketch over all values (merge identity) and land
    # near the true quantiles of uniform(0, 100k).
    df = spark.range(0, 100_000).select(
        (F.col("id") % 4).alias("cell"), F.col("id").cast("double").alias("v")
    )
    fine = SK.kll_rollup(df, "v", ["cell"], k=2048)
    assert fine.count() == 4
    merged = SK.kll_merge(fine.withColumn("g", F.lit(1)), ["g"])
    got = SK.kll_quantiles(merged, [0.5, 0.95, 0.99], ["p50", "p95", "p99"]).collect()[0]
    assert abs(got["p50"] - 50_000) < 1_500
    assert abs(got["p95"] - 95_000) < 1_500
    assert abs(got["p99"] - 99_000) < 1_500

    direct = df.agg(
        F.kll_sketch_get_quantile_double(
            F.kll_sketch_agg_double("v", F.lit(2048)), F.lit(0.5)
        ).alias("p50")
    ).collect()[0]["p50"]
    assert abs(got["p50"] - direct) <= 0.01 * 100_000


def test_kll_merge_single_cell_group_is_identity(spark):
    # a coarse group holding exactly one cell must pass the sketch
    # through unchanged (the fold's init-only path)
    df = spark.range(0, 1000).select(
        F.lit(0).alias("cell"), F.col("id").cast("double").alias("v")
    )
    fine = SK.kll_rollup(df, "v", ["cell"], k=2048)
    merged = SK.kll_merge(fine, ["cell"])
    p50 = SK.kll_quantiles(merged, [0.5], ["p50"]).collect()[0]["p50"]
    assert abs(p50 - 500) < 50


def test_cms_merge_identity_and_one_sided_error(spark):
    """CMS cells are additive: merging per-group cell tables must be
    IDENTICAL to sketching the whole corpus directly (not just within
    bounds — cell-for-cell equal), and point estimates never
    undercount."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.sketches import (
        cms_merge,
        cms_point_estimates,
        cms_rollup,
    )

    rows = [(i % 7, f"g{i % 3}") for i in range(500)] + [(99, "g0")] * 40
    df = spark.createDataFrame(rows, ["v", "g"])

    fine = cms_rollup(df, "v", ["g"], depth=4, width=64)
    merged = cms_merge(fine, [])
    direct = cms_merge(cms_rollup(df, "v", [], depth=4, width=64), [])
    assert {
        (r["cms_row"], r["cms_col"], r["cms_count"])
        for r in merged.collect()
    } == {
        (r["cms_row"], r["cms_col"], r["cms_count"])
        for r in direct.collect()
    }

    probes = df.select("v").distinct()
    est = {
        r["v"]: r["cms_estimate"]
        for r in cms_point_estimates(
            merged, probes, "v", depth=4, width=64
        ).collect()
    }
    exact = {
        r["v"]: r["cnt"]
        for r in df.groupBy("v").agg(F.count("*").alias("cnt")).collect()
    }
    n = sum(exact.values())
    for v, true_cnt in exact.items():
        assert est[v] >= true_cnt  # one-sided guarantee
        # e/width bound with headroom (depth-4 failure prob ~6%
        # per value; this fixed seed-free layout is deterministic,
        # so the assertion is stable)
        assert est[v] <= true_cnt + (3.0 / 64) * n


def test_cms_unseen_value_estimates_small(spark):
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.sketches import (
        cms_merge,
        cms_point_estimates,
        cms_rollup,
    )

    df = spark.createDataFrame([(i,) for i in range(200)], ["v"])
    merged = cms_merge(cms_rollup(df, "v", [], depth=4, width=256), [])
    probes = spark.createDataFrame([(10_000,), (10_001,)], ["v"])
    for r in cms_point_estimates(merged, probes, "v", depth=4, width=256).collect():
        assert 0 <= r["cms_estimate"] <= 200 * 3.0 / 256
