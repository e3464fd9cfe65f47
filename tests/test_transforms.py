"""Hidden partition transforms: bucket(N, key) and days(ts)."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from medallion_architecture_using_apache_iceberg_table_buckets_spark.lakehouse import (
    Catalog,
    merge_into,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def make(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


import datetime as dt

ROWS = [(i, f"v{i}", dt.datetime(2024, 1, 1 + i % 3)) for i in range(40)]


def test_bucket_write_read_hidden(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "t", SCHEMA, partition_by=["bucket(4, id)"])
    t.append(make(spark, ROWS))
    files = t.current_snapshot().files
    assert all("_p_id_bucket=" in f for f in files)
    assert len({f.split("/")[0] for f in files}) > 1  # multiple buckets
    out = t.read(spark)
    assert out.schema == SCHEMA  # hidden col not surfaced
    assert out.count() == 40


def test_days_transform(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "t2", SCHEMA, partition_by=["days(ts)"])
    t.append(make(spark, ROWS))
    files = t.current_snapshot().files
    assert all("_p_ts_day=2024-01-0" in f for f in files)
    assert t.read(spark).schema == SCHEMA
    # day-partition pruning reaches the scan via the hidden dirs
    assert t.read(spark).filter(F.col("ts") >= "2024-01-03").count() == len(
        [r for r in ROWS if r[2] >= dt.datetime(2024, 1, 3)]
    )


def test_merge_prunes_to_source_buckets(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "t3", SCHEMA, partition_by=["bucket(8, id)"])
    t.append(make(spark, ROWS))
    before = set(t.current_snapshot().files)
    merge_into(spark, t, make(spark, [(0, "upd", dt.datetime(2024, 2, 1))]), on="id")
    snap = t.current_snapshot()
    # id=0's bucket
    bucket_dir = [f.split("/")[0] for f in snap.removed_files]
    assert len(snap.removed_files) >= 1
    assert len(set(bucket_dir)) == 1  # only one bucket touched
    # all other buckets' files untouched
    untouched = {f for f in before if f.split("/")[0] != bucket_dir[0]}
    assert untouched <= set(snap.files)
    rows = {r["id"]: r["v"] for r in t.read(spark).collect()}
    assert rows[0] == "upd" and len(rows) == 40


def test_merge_bucket_correctness_update_insert_delete(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "t4", SCHEMA, partition_by=["bucket(4, id)"])
    t.append(make(spark, ROWS))
    src = spark.createDataFrame(
        [
            ("U", 1, "u1", dt.datetime(2024, 3, 1)),
            ("I", 999, "new", dt.datetime(2024, 3, 1)),
            ("D", 2, None, None),
        ],
        "Op string, id long, v string, ts timestamp",
    )
    merge_into(spark, t, src, on="id", delete_predicate="Op = 'D'")
    rows = {r["id"]: r["v"] for r in t.read(spark).collect()}
    assert rows[1] == "u1"
    assert rows[999] == "new"
    assert 2 not in rows
    assert len(rows) == 40  # 40 - 1 deleted + 1 inserted
