"""Salted aggregation / join must be result-identical to the direct plans."""

from pyspark.sql import functions as F

from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.skew import (
    salted_agg,
    salted_join,
)


def test_salted_agg_matches_direct(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    direct = {
        r["l_returnflag"]: (r["n"], round(r["qty"], 2), r["mx"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum("l_quantity").alias("qty"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    salted = {
        r["l_returnflag"]: (r["n"], round(r["qty"], 2), r["mx"])
        for r in salted_agg(
            li,
            ["l_returnflag"],
            {"n": ("*", "count"), "qty": ("l_quantity", "sum"), "mx": ("l_extendedprice", "max")},
            salt_buckets=8,
        ).collect()
    }
    assert direct == salted


def test_salted_join_matches_direct(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    direct = orders.join(cust, ["o_custkey"]).groupBy("c_mktsegment").count()
    salted = salted_join(orders, cust, ["o_custkey"], salt_buckets=4).groupBy(
        "c_mktsegment"
    ).count()
    assert {tuple(r) for r in direct.collect()} == {tuple(r) for r in salted.collect()}
