"""X2 failure routing: a failing step stops the pipeline and surfaces
the error; checkpoints are not advanced past the failure."""

import pytest
from pyspark.sql import types as T

from medallion_architecture_using_apache_iceberg_table_buckets_spark.lakehouse import Catalog
from medallion_architecture_using_apache_iceberg_table_buckets_spark.pipeline import (
    JsonCheckpoint,
    MedallionPipeline,
)


def test_failing_ingest_propagates_and_preserves_checkpoint(spark, tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    # declared schema with a column the file cannot satisfy under ANSI
    bad_schema = T.StructType(
        [T.StructField("invoiceid", T.LongType()), T.StructField("price", T.DoubleType())]
    )
    (raw / "a.csv").write_text("invoiceid\tprice\n1\t2.5\n")
    pipe = MedallionPipeline(
        catalog=Catalog(tmp_path / "wh"),
        namespace="s",
        input_path=raw,
        checkpoint_dir=tmp_path / "ck",
        schema=bad_schema,
        key="invoiceid",
        order_by=("processed_time", "ingest_seq"),
    )
    pipe.run_once(spark)  # first run fine
    assert pipe.catalog.table("s", "bronze_orders").read(spark).count() == 1

    # now make the silver hop fail: drop the key column from new data
    # by feeding a file whose rows are all-null for the key, then
    # simulate failure by pointing the merge at a nonexistent key col
    pipe2 = MedallionPipeline(
        catalog=pipe.catalog,
        namespace="s",
        input_path=raw,
        checkpoint_dir=tmp_path / "ck",
        schema=bad_schema,
        key="no_such_column",
    )
    (raw / "b.csv").write_text("invoiceid\tprice\n2\t3.5\n")
    import time

    time.sleep(0.02)
    with pytest.raises(Exception):
        pipe2.run_once(spark)
    # bronze ingested (step 1 succeeded), but the silver checkpoint
    # must NOT have advanced past the failed merge
    ck = JsonCheckpoint(tmp_path / "ck" / "bronze_silver.json").load()
    bronze = pipe.catalog.table("s", "bronze_orders")
    assert ck["last_processed_snapshot"] < bronze.latest_snapshot_id()
    # recovery: correct pipeline processes the pending snapshot
    r = pipe.run_once(spark)
    assert r[1]["status"] == "merged"
    assert pipe.catalog.table("s", "silver_orders").read(spark).count() == 2
