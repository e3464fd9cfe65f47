"""Hive partition-path escaping fidelity and the pruning paths that
depend on it (ADVICE r01: merge pruning and gold incremental refresh
compared raw values against escaped directory names)."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from medallion_architecture_using_apache_iceberg_table_buckets_spark.lakehouse import (
    Catalog,
    merge_into,
)
from medallion_architecture_using_apache_iceberg_table_buckets_spark.lakehouse.transforms import (
    escape_path_name,
    partition_segment,
    unescape_path_name,
)
from medallion_architecture_using_apache_iceberg_table_buckets_spark.pipeline import (
    build_gold_mart,
)

SCHEMA = T.StructType(
    [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
)

NASTY = ["a:b", "x#y", "p%q", "c=d", "e f", "g'h", "i[j]", "plain"]


def test_escape_matches_spark_writer(spark, tmp_path):
    """Our escape twin must reproduce the exact directory names the
    Spark partitioned writer creates — byte for byte."""
    df = spark.createDataFrame([(k, 1) for k in NASTY], SCHEMA)
    out = tmp_path / "pq"
    df.write.partitionBy("k").parquet(str(out))
    on_disk = {p.name for p in out.iterdir() if p.name.startswith("k=")}
    expected = {f"k={escape_path_name(k)}" for k in NASTY}
    assert on_disk == expected
    # and unescape inverts what the writer produced
    assert {unescape_path_name(d[len("k="):]) for d in on_disk} == set(NASTY)


def test_partition_segment_safety():
    import datetime

    assert partition_segment("k", "a:b") == "k=a%3Ab"
    assert partition_segment("k", 7) == "k=7"
    assert partition_segment("k", True) == "k=true"
    assert partition_segment("k", datetime.date(2024, 1, 2)) == "k=2024-01-02"
    # unreproducible written forms must disable pruning, not guess
    assert partition_segment("k", None) is None
    assert partition_segment("k", "") is None
    assert partition_segment("k", 1.5) is None
    assert (
        partition_segment("k", datetime.datetime(2024, 1, 2, 3, 4, 5, 6)) is None
    )


def test_merge_handles_escaped_partition_keys(spark, tmp_path):
    """MERGE on a string key containing ':' in a key-partitioned
    table: before the fix the pruning compared 'k=a:b' against the
    escaped dir 'k=a%3Ab', skipped the file, and left the stale row
    behind (duplicate keys)."""
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "t", SCHEMA, partition_by=["k"])
    t.append(
        spark.createDataFrame([("a:b", 1), ("x#y", 2), ("plain", 3)], SCHEMA)
    )
    merge_into(
        spark, t, spark.createDataFrame([("a:b", 10)], SCHEMA), on="k"
    )
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert got == {"a:b": 10, "x#y": 2, "plain": 3}
    assert t.read(spark).count() == 3  # no duplicate keys


def test_gold_incremental_keeps_null_group(spark, tmp_path):
    """NULL-keyed mart rows must survive an incremental refresh
    (~isin is NULL for them, which used to drop the null group)."""
    cat = Catalog(tmp_path / "wh")
    silver = cat.create_table("s", "silver", SCHEMA, partition_by=["k"])
    silver.append(
        spark.createDataFrame([("a", 1), ("b", 2), (None, 5)], SCHEMA)
    )
    aggs = {"n": ("*", "count"), "total": ("v", "sum")}
    build_gold_mart(spark, cat, "s", "silver", "gold", ["k"], aggs)

    def mart():
        return {
            r["k"]: (r["n"], r["total"])
            for r in cat.table("s", "gold").read(spark).collect()
        }

    assert mart()[None] == (1, 5.0)
    # touch only partition 'a' -> incremental path; null group must stay
    merge_into(
        spark, silver, spark.createDataFrame([("a", 100)], SCHEMA), on="k"
    )
    status = build_gold_mart(spark, cat, "s", "silver", "gold", ["k"], aggs)
    assert status["mode"].startswith("incremental")
    m = mart()
    assert m[None] == (1, 5.0)
    assert m["a"] == (1, 100.0)
    assert m["b"] == (1, 2.0)


def test_gold_null_partition_change_falls_back_to_full(spark, tmp_path):
    """A batch that touches the __HIVE_DEFAULT_PARTITION__ directory
    cannot be expressed as a value filter -> full refresh."""
    cat = Catalog(tmp_path / "wh")
    silver = cat.create_table("s", "silver", SCHEMA, partition_by=["k"])
    silver.append(spark.createDataFrame([("a", 1), (None, 5)], SCHEMA))
    aggs = {"n": ("*", "count"), "total": ("v", "sum")}
    build_gold_mart(spark, cat, "s", "silver", "gold", ["k"], aggs)
    silver.append(
        spark.createDataFrame([(None, 7)], SCHEMA).withColumn(
            "k", F.lit(None).cast("string")
        )
    )
    status = build_gold_mart(spark, cat, "s", "silver", "gold", ["k"], aggs)
    assert status["mode"] == "full"
    got = {
        r["k"]: (r["n"], r["total"])
        for r in cat.table("s", "gold").read(spark).collect()
    }
    assert got[None] == (2, 12.0)


def test_mor_resolve_with_escaped_partition_keys(spark, tmp_path):
    """MOR delta resolution joins manifest sequence info per file;
    escaped partition dirs must not break the newest-wins resolve."""
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table(
        "d", "mor", SCHEMA, partition_by=["k"],
        properties={"write.merge.mode": "merge-on-read"},
    )
    t.append(spark.createDataFrame([("a:b", 1), ("plain", 2)], SCHEMA))
    merge_into(
        spark, t, spark.createDataFrame([("a:b", 10)], SCHEMA), on="k"
    )
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert got == {"a:b": 10, "plain": 2}
