"""Structured Streaming ingest + streaming upsert tests."""

import time

from pyspark.sql import types as T

from medallion_architecture_using_apache_iceberg_table_buckets_spark.lakehouse import Catalog
from medallion_architecture_using_apache_iceberg_table_buckets_spark.streaming import (
    stream_bronze_to_silver,
    stream_raw_to_bronze,
)

SCHEMA = T.StructType(
    [
        T.StructField("Op", T.StringType()),
        T.StructField("invoiceid", T.LongType()),
        T.StructField("category", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("destinationstate", T.StringType()),
    ]
)

HEADER = "Op\tinvoiceid\tcategory\tprice\tdestinationstate"


def test_streaming_medallion_roundtrip(spark, tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    cat = Catalog(tmp_path / "wh")

    (raw / "b1.csv").write_text(
        HEADER + "\nI\t1\tdegree\t53.51\tSC\nI\t2\tbit\t40.94\tPW\n"
    )
    n1 = stream_raw_to_bronze(
        spark, cat, raw, "sales", "bronze", tmp_path / "ck_stream", SCHEMA
    )
    assert n1 >= 1
    assert cat.table("sales", "bronze").read(spark).count() == 2

    m1 = stream_bronze_to_silver(
        spark, cat, "sales", "bronze", "silver", tmp_path / "ck_silver.json"
    )
    assert m1 >= 1
    assert cat.table("sales", "silver").read(spark).count() == 2

    # second file: update invoice 1 — the file source must pick up ONLY
    # the new file (exactly-once tracking), merge must upsert
    time.sleep(0.02)
    (raw / "b2.csv").write_text(HEADER + "\nU\t1\tdegree####\t53.51\tSC\n")
    n2 = stream_raw_to_bronze(
        spark, cat, raw, "sales", "bronze", tmp_path / "ck_stream", SCHEMA
    )
    assert n2 >= 1
    assert cat.table("sales", "bronze").read(spark).count() == 3  # append-only

    m2 = stream_bronze_to_silver(
        spark, cat, "sales", "bronze", "silver", tmp_path / "ck_silver.json"
    )
    assert m2 >= 1
    silver = cat.table("sales", "silver").read(spark)
    rows = {r["invoiceid"]: r for r in silver.collect()}
    assert len(rows) == 2
    assert rows[1]["category"] == "degree####"
    assert "Op" not in silver.columns

    # no new data -> zero batches on both hops
    assert stream_raw_to_bronze(
        spark, cat, raw, "sales", "bronze", tmp_path / "ck_stream", SCHEMA
    ) == 0
    assert stream_bronze_to_silver(
        spark, cat, "sales", "bronze", "silver", tmp_path / "ck_silver.json"
    ) == 0
