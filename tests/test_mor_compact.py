"""Merge-on-read mode + compaction tests."""

from pyspark.sql import types as T

from medallion_architecture_using_apache_iceberg_table_buckets_spark.lakehouse import (
    Catalog,
    merge_into,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("state", T.StringType()),
    ]
)


def make(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_mor_merge_append_only_and_resolve(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table(
        "d", "t", SCHEMA, partition_by=["state"],
        properties={"write.merge.mode": "merge-on-read"},
    )
    t.append(make(spark, [(1, "a", "SC"), (2, "b", "CT")]))
    files_before = set(t.current_snapshot().files)

    merge_into(spark, t, make(spark, [(1, "a2", "SC"), (3, "c", "PW")]), on="id")
    snap = t.current_snapshot()
    # MOR: no base file rewritten, only delta files added
    assert files_before <= set(snap.files)
    assert snap.operation == "merge-delta"
    assert snap.removed_files == []

    rows = {r["id"]: r["v"] for r in t.read(spark).collect()}
    assert rows == {1: "a2", 2: "b", 3: "c"}


def test_mor_delete_and_second_merge(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table(
        "d", "t2", SCHEMA, properties={"write.merge.mode": "merge-on-read"}
    )
    t.append(make(spark, [(1, "a", "SC"), (2, "b", "CT")]))
    src = spark.createDataFrame(
        [("D", 1, None, None), ("U", 2, "b2", "CT")],
        "Op string, id long, v string, state string",
    )
    merge_into(spark, t, src, on="id", delete_predicate="Op = 'D'")
    rows = {r["id"]: r["v"] for r in t.read(spark).collect()}
    assert rows == {2: "b2"}
    # newer delta overrides older delta
    merge_into(spark, t, make(spark, [(2, "b3", "CT"), (1, "back", "SC")]), on="id")
    rows = {r["id"]: r["v"] for r in t.read(spark).collect()}
    assert rows == {1: "back", 2: "b3"}


def test_compact_resolves_deltas_and_merges_files(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table(
        "d", "t3", SCHEMA, properties={"write.merge.mode": "merge-on-read"}
    )
    t.append(make(spark, [(1, "a", "SC"), (2, "b", "CT")]))
    merge_into(spark, t, make(spark, [(1, "a2", "SC")]), on="id")
    assert t._delta_files(t.current_snapshot())

    t.compact(spark, target_partitions=1)
    snap = t.current_snapshot()
    assert snap.operation == "replace"
    assert not t._delta_files(snap)  # pure base files again
    rows = {r["id"]: r["v"] for r in t.read(spark).collect()}
    assert rows == {1: "a2", 2: "b"}
    # post-compact reads are plain scans; time travel still resolves MOR
    assert {r["id"]: r["v"] for r in t.read(spark, snapshot_id=3).collect()} == {
        1: "a2",
        2: "b",
    }


def test_compact_small_files_append_table(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "t4", SCHEMA)
    for i in range(5):
        t.append(make(spark, [(i, "x", "SC")]))
    n_before = len(t.current_snapshot().files)
    t.compact(spark, target_partitions=1)
    assert len(t.current_snapshot().files) < n_before
    assert t.read(spark).count() == 5
