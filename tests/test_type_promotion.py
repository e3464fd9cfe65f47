"""Widening type promotion (Iceberg schema evolution): metadata-only;
old files keep their narrow physical type and the Parquet reader
up-casts at scan time."""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from medallion_architecture_using_apache_iceberg_table_buckets_spark.lakehouse import (
    Catalog,
    merge_into,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType()),
        T.StructField("r", T.FloatType()),
        T.StructField("m", T.DecimalType(10, 2)),
    ]
)


def make(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


ROWS = [(1, 1.5, Decimal("10.25")), (2, 2.5, Decimal("20.50"))]


def test_promote_int_float_decimal(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "t", SCHEMA)
    t.append(make(spark, ROWS))
    old_files = set(t.current_snapshot().files)
    t.promote_column("k", T.LongType())
    t.promote_column("r", T.DoubleType())
    snap = t.promote_column("m", T.DecimalType(18, 2))
    assert snap.operation == "evolve-schema"
    assert set(snap.files) == old_files  # no rewrite
    got = t.read(spark)
    types = {f.name: f.dataType for f in got.schema.fields}
    assert isinstance(types["k"], T.LongType)
    assert isinstance(types["r"], T.DoubleType)
    assert types["m"] == T.DecimalType(18, 2)
    rows = {r["k"]: (r["r"], r["m"]) for r in got.collect()}
    assert rows == {1: (1.5, Decimal("10.25")), 2: (2.5, Decimal("20.50"))}
    # mixed-generation files: post-promotion appends write WIDE
    t.append(
        spark.createDataFrame(
            [(3_000_000_000, 3.5, Decimal("9999999999999999.99"))],
            t.schema,
        )
    )
    assert t.read(spark).count() == 3
    assert t.read(spark).filter(F.col("k") > 2**31).count() == 1


def test_unsafe_promotions_rejected(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "t2", SCHEMA)
    t.append(make(spark, ROWS))
    for col, bad in (
        ("k", T.IntegerType()),  # same type -> no-op, not error
        ("r", T.FloatType()),
    ):
        v = t.current_snapshot().version
        assert t.promote_column(col, bad).version == v
    with pytest.raises(ValueError, match="unsafe"):
        t.promote_column("k", T.StringType())
    with pytest.raises(ValueError, match="unsafe"):
        t.promote_column("r", T.LongType())
    with pytest.raises(ValueError, match="unsafe"):
        t.promote_column("m", T.DecimalType(18, 4))  # scale change
    with pytest.raises(KeyError):
        t.promote_column("nope", T.LongType())


def test_sql_alter_column_type_and_time_travel(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "t3", SCHEMA)
    t.append(make(spark, ROWS))
    pre = t.current_snapshot().snapshot_id
    sess = cat.sql_session(spark)
    sess.sql("USE d")
    sess.sql("ALTER TABLE t3 ALTER COLUMN k TYPE BIGINT")
    assert isinstance(t.schema["k"].dataType, T.LongType)
    # time travel to before the promotion reads the narrow schema
    old = t.read(spark, snapshot_id=pre)
    assert isinstance(old.schema["k"].dataType, T.IntegerType)
    with pytest.raises(ValueError, match="unsafe"):
        sess.sql("ALTER TABLE t3 ALTER COLUMN r TYPE STRING")


def test_promotion_keeps_field_id_in_export(spark, tmp_path):
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.lakehouse.iceberg_compat import (
        table_metadata,
    )

    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "t4", SCHEMA)
    t.append(make(spark, ROWS))
    before = {
        f["name"]: (f["id"], f["type"])
        for f in table_metadata(t)["schemas"][0]["fields"]
    }
    t.promote_column("k", T.LongType())
    after = {
        f["name"]: (f["id"], f["type"])
        for f in table_metadata(t)["schemas"][0]["fields"]
    }
    assert after["k"][0] == before["k"][0]  # id kept
    assert before["k"][1] == "int" and after["k"][1] == "long"
    assert after["r"] == before["r"]


def test_promotion_with_merge_and_deletes(spark, tmp_path):
    """Row-level ops keep working across the type generation."""
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "t5", SCHEMA)
    t.append(make(spark, ROWS))
    t.promote_column("k", T.LongType())
    merge_into(
        spark, t,
        spark.createDataFrame(
            [(2, 9.0, Decimal("99.99")), (5_000_000_000, 5.0,
                                          Decimal("5.00"))],
            t.schema,
        ),
        on="k",
    )
    got = {r["k"]: float(r["r"]) for r in t.read(spark).collect()}
    assert got == {1: 1.5, 2: 9.0, 5_000_000_000: 5.0}
    t.delete_where(spark, "k = 1")
    assert sorted(r["k"] for r in t.read(spark).collect()) == [
        2, 5_000_000_000,
    ]
