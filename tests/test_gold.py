"""Gold-layer marts: full build, partition-incremental refresh,
vanished-group handling, up-to-date short-circuit."""

from pyspark.sql import types as T

from medallion_architecture_using_apache_iceberg_table_buckets_spark.lakehouse import (
    Catalog,
    merge_into,
)
from medallion_architecture_using_apache_iceberg_table_buckets_spark.pipeline import (
    build_gold_mart,
)

SCHEMA = T.StructType(
    [
        T.StructField("invoiceid", T.LongType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("state", T.StringType()),
    ]
)

AGGS = {"n_orders": ("*", "count"), "revenue": ("price", "sum")}


def make(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def gold_rows(spark, cat):
    return {
        r["state"]: (r["n_orders"], r["revenue"])
        for r in cat.table("sales", "gold_by_state").read(spark).collect()
    }


def build(spark, cat):
    return build_gold_mart(
        spark, cat, "sales", "silver", "gold_by_state",
        group_by=["state"], aggs=AGGS,
    )


def test_gold_full_then_incremental(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    silver = cat.create_table("sales", "silver", SCHEMA, partition_by=["state"])
    silver.append(
        make(spark, [(1, 10.0, "SC"), (2, 20.0, "SC"), (3, 5.0, "CT")])
    )

    r1 = build(spark, cat)
    assert r1["mode"] == "full"
    assert gold_rows(spark, cat) == {"SC": (2, 30.0), "CT": (1, 5.0)}

    # no change -> short-circuit
    assert build(spark, cat)["status"] == "up_to_date"

    # CDC touches only SC -> incremental refresh of one partition
    merge_into(spark, silver, make(spark, [(1, 100.0, "SC")]), on="invoiceid")
    r2 = build(spark, cat)
    assert r2["status"] == "refreshed"
    assert "incremental" in r2["mode"]
    assert gold_rows(spark, cat) == {"SC": (2, 120.0), "CT": (1, 5.0)}


def test_gold_vanished_group_removed(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    silver = cat.create_table("sales", "silver", SCHEMA, partition_by=["state"])
    silver.append(make(spark, [(1, 10.0, "SC"), (2, 5.0, "CT")]))
    build(spark, cat)

    # delete the only CT row; the CT mart row must disappear
    src = spark.createDataFrame(
        [("D", 2, None, "CT")], "Op string, invoiceid long, price double, state string"
    )
    merge_into(spark, silver, src, on="invoiceid", delete_predicate="Op = 'D'")
    r = build(spark, cat)
    assert "incremental" in r["mode"]
    assert gold_rows(spark, cat) == {"SC": (1, 10.0)}
