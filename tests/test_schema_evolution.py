"""Schema evolution: add/rename/drop columns as metadata-only commits
with old data files resolved at read time (the format-version: 2
behavior the reference delegates to Iceberg —
scripts/bronze-silver.py:197)."""

import pytest
from pyspark.sql import types as T

from medallion_architecture_using_apache_iceberg_table_buckets_spark.lakehouse import (
    Catalog,
    merge_into,
)

SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
)


def make(spark, rows, ddl="id long, v string"):
    return spark.createDataFrame(rows, ddl)


def test_add_column_reads_old_files_as_null(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "t", SCHEMA)
    t.append(make(spark, [(1, "a"), (2, "b")]))
    snap = t.add_column("score", "double")
    assert snap.operation == "evolve-schema"
    assert [f.name for f in t.schema.fields] == ["id", "v", "score"]
    # pre-evolution files read back with null in the new column
    got = {r["id"]: r["score"] for r in t.read(spark).collect()}
    assert got == {1: None, 2: None}
    # new writes carry the column; both generations coexist
    t.append(make(spark, [(3, "c", 0.5)], "id long, v string, score double"))
    got = {r["id"]: r["score"] for r in t.read(spark).collect()}
    assert got == {1: None, 2: None, 3: 0.5}
    # time travel shows the pre-evolution schema
    old = t.read(spark, snapshot_id=1)
    assert old.columns == ["id", "v"]


def test_rename_column_preserves_old_data(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "t", SCHEMA)
    t.append(make(spark, [(1, "a"), (2, "b")]))
    t.rename_column("v", "label")
    assert [f.name for f in t.schema.fields] == ["id", "label"]
    got = {r["id"]: r["label"] for r in t.read(spark).collect()}
    assert got == {1: "a", 2: "b"}  # old physical column resolved
    # writes after the rename use the new name; reads stay unified
    t.append(make(spark, [(3, "c")], "id long, label string"))
    got = {r["id"]: r["label"] for r in t.read(spark).collect()}
    assert got == {1: "a", 2: "b", 3: "c"}
    # chained rename flattens to the original physical name
    t.rename_column("label", "tag")
    got = {r["id"]: r["tag"] for r in t.read(spark).collect()}
    assert got == {1: "a", 2: "b", 3: "c"}
    # merge on the renamed table still rewrites correctly
    merge_into(
        spark, t, make(spark, [(1, "A")], "id long, tag string"), on="id"
    )
    got = {r["id"]: r["tag"] for r in t.read(spark).collect()}
    assert got == {1: "A", 2: "b", 3: "c"}


def test_drop_column_and_guards(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "t", SCHEMA, partition_by=["v"])
    t.append(make(spark, [(1, "a")]))
    t.add_column("extra", "int")
    t.drop_column("extra")
    assert [f.name for f in t.schema.fields] == ["id", "v"]
    assert t.read(spark).count() == 1
    # partition-driving columns are immutable
    with pytest.raises(ValueError, match="partition"):
        t.rename_column("v", "w")
    with pytest.raises(ValueError, match="partition"):
        t.drop_column("v")
    with pytest.raises(ValueError, match="exists"):
        t.add_column("id", "long")


def test_rename_physical_name_collisions(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "t", SCHEMA)
    t.append(make(spark, [(1, "a")]))
    t.rename_column("v", "label")
    # reusing the physical name would make old files ambiguous
    with pytest.raises(ValueError, match="physical"):
        t.add_column("v", "string")
    with pytest.raises(ValueError, match="physical"):
        t.rename_column("label", "v")


def test_incremental_read_crosses_evolution(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "t", SCHEMA)
    s1 = t.append(make(spark, [(1, "a")]))
    t.add_column("score", "double")
    t.append(make(spark, [(2, "b", 1.5)], "id long, v string, score double"))
    inc = t.read_incremental(spark, start_snapshot_id=s1.snapshot_id)
    rows = inc.collect()
    assert {r["id"] for r in rows} == {2}
    assert rows[0]["score"] == 1.5
