"""Data-quality constraint primitives (operators/quality.py):
row-check fusion, dbt-style unique counting (every member of a >1
group), and SQL referential semantics (null FK is not a violation)."""

from pyspark.sql import functions as F

from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.quality import (
    constraint_report,
    fk_violations,
    row_violations,
    unique_violations,
)


def test_row_checks_fuse_into_one_agg(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -3.0), (3, None), (4, 200.0)], ["id", "v"]
    )
    out = row_violations(
        df,
        {
            "v_not_null": F.col("v").isNull(),
            "v_range": ~F.col("v").between(0, 100),
        },
    )
    got = {r["check"]: r["n_violations"] for r in out.collect()}
    # range check sees nulls as non-violations (null predicate rows
    # are skipped by sum) — the not-null check owns them
    assert got == {"v_not_null": 1, "v_range": 2}
    # one aggregate node, not one per check
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") == 1


def test_unique_counts_every_group_member(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (3,)], ["k"]
    )
    out = unique_violations(df, ["k"], "k_unique").collect()[0]
    assert out["n_violations"] == 3  # all three k=1 rows


def test_fk_nulls_are_not_orphans(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 99), (3, None)], ["id", "fk"]
    )
    parent = spark.createDataFrame([(10,), (20,)], ["pk"])
    out = fk_violations(child, ["fk"], parent, ["pk"], "fk").collect()[0]
    assert out["n_violations"] == 1  # only fk=99; null is legal


def test_report_shape_and_ok_flag(spark):
    df = spark.createDataFrame([(1,), (1,)], ["k"])
    rep = constraint_report(
        [
            row_violations(df, {"never": F.lit(False)}),
            unique_violations(df, ["k"], "k_unique"),
        ]
    ).collect()
    by = {r["check"]: r for r in rep}
    assert by["never"]["ok"] is True and by["never"]["n_violations"] == 0
    assert by["k_unique"]["ok"] is False and by["k_unique"]["n_violations"] == 2
