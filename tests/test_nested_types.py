"""Nested types (struct / array / map) through the lakehouse core:
create, append, merge, row-level ops, schema export field-ids."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from medallion_architecture_using_apache_iceberg_table_buckets_spark.lakehouse import (
    Catalog,
    merge_into,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField(
            "addr",
            T.StructType(
                [
                    T.StructField("city", T.StringType()),
                    T.StructField("zip", T.IntegerType()),
                ]
            ),
        ),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("props", T.MapType(T.StringType(), T.LongType())),
    ]
)


def make(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


ROWS = [
    (1, ("berlin", 10115), ["a", "b"], {"x": 1}),
    (2, ("paris", 75001), [], {}),
    (3, (None, None), None, None),
]


def test_nested_roundtrip_and_rowlevel_ops(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "n", SCHEMA)
    t.append(make(spark, ROWS))
    got = {r["id"]: r for r in t.read(spark).collect()}
    assert got[1]["addr"]["city"] == "berlin"
    assert got[1]["tags"] == ["a", "b"]
    assert got[1]["props"] == {"x": 1}
    assert got[3]["tags"] is None
    # nested predicates push through scan
    assert t.scan(spark, "addr.zip = 75001").collect()[0]["id"] == 2
    # merge on the top-level key updates nested payloads
    merge_into(
        spark, t,
        make(spark, [(2, ("lyon", 69001), ["z"], {"y": 9})]),
        on="id",
    )
    upd = t.read(spark).filter("id = 2").collect()[0]
    assert upd["addr"]["city"] == "lyon" and upd["props"] == {"y": 9}
    # row-level delete with a nested predicate
    t.delete_where(spark, "addr.city = 'berlin'")
    assert sorted(r["id"] for r in t.read(spark).collect()) == [2, 3]
    # add a nested column via evolution: old rows read null
    t.add_column("extra", T.StructType(
        [T.StructField("n", T.LongType())]
    ))
    assert t.read(spark).filter("extra IS NULL").count() == 2


def test_nested_field_ids_export(spark, tmp_path):
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.lakehouse.iceberg_compat import (
        table_metadata,
    )

    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "n2", SCHEMA)
    t.append(make(spark, ROWS[:1]))
    doc = table_metadata(t)
    fields = {f["name"]: f for f in doc["schemas"][0]["fields"]}
    addr = fields["addr"]["type"]
    assert addr["type"] == "struct"
    inner_ids = [f["id"] for f in addr["fields"]]
    tags = fields["tags"]["type"]
    assert tags["type"] == "list" and "element-id" in tags
    props = fields["props"]["type"]
    assert props["type"] == "map" and "key-id" in props and "value-id" in props
    # every id unique across the whole schema tree
    all_ids = inner_ids + [
        f["id"] for f in doc["schemas"][0]["fields"]
    ] + [tags["element-id"], props["key-id"], props["value-id"]]
    assert len(all_ids) == len(set(all_ids))
    assert doc["last-column-id"] >= max(all_ids)


def test_nested_mor_position_delete(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table(
        "d", "n3", SCHEMA,
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.append(make(spark, ROWS))
    snap = t.delete_where(spark, "tags IS NOT NULL AND size(tags) = 0")
    assert snap.delete_files
    assert sorted(r["id"] for r in t.read(spark).collect()) == [1, 3]
