"""Incremental view maintenance for join marts (pipeline/ivm.py):
delta-join refreshes stay identical to a full re-join."""

from pyspark.sql import types as T

from medallion_architecture_using_apache_iceberg_table_buckets_spark.lakehouse import (
    Catalog,
)
from medallion_architecture_using_apache_iceberg_table_buckets_spark.pipeline.ivm import (
    refresh_join_view,
)

L_SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("amt", T.DoubleType())]
)
R_SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("seg", T.StringType())]
)


def _mk(spark, schema, rows):
    return spark.createDataFrame(rows, schema)


def _view_rows(spark, cat):
    return sorted(
        (r["k"], r["amt"], r["seg"])
        for r in cat.table("s", "v").read(spark).collect()
    )


def _full_join(spark, cat):
    l = cat.table("s", "l").read(spark)
    r = cat.table("s", "r").read(spark)
    return sorted(
        (x["k"], x["amt"], x["seg"]) for x in l.join(r, "k").collect()
    )


def test_delta_refresh_matches_full_join(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    l = cat.create_table("s", "l", L_SCHEMA)
    r = cat.create_table("s", "r", R_SCHEMA)
    l.append(_mk(spark, L_SCHEMA, [(1, 10.0), (2, 20.0), (9, 90.0)]))
    r.append(_mk(spark, R_SCHEMA, [(1, "a"), (2, "b")]))
    st = refresh_join_view(spark, cat, "s", "l", "r", "v", ["k"])
    assert st["mode"] == "full"
    assert _view_rows(spark, cat) == _full_join(spark, cat)

    # left-only delta: new fact rows join the full dim
    l.append(_mk(spark, L_SCHEMA, [(1, 11.0), (2, 21.0)]))
    st = refresh_join_view(spark, cat, "s", "l", "r", "v", ["k"])
    assert st["mode"] == "delta"
    assert _view_rows(spark, cat) == _full_join(spark, cat)

    # right-only delta: key 9 (so far unmatched) joins retroactively
    r.append(_mk(spark, R_SCHEMA, [(9, "z")]))
    st = refresh_join_view(spark, cat, "s", "l", "r", "v", ["k"])
    assert st["mode"] == "delta"
    assert _view_rows(spark, cat) == _full_join(spark, cat)

    # both sides move in one refresh: the dO x dC cross term must
    # appear exactly once (dO joins C_NEW, O_old joins dC)
    l.append(_mk(spark, L_SCHEMA, [(7, 70.0)]))
    r.append(_mk(spark, R_SCHEMA, [(7, "g")]))
    st = refresh_join_view(spark, cat, "s", "l", "r", "v", ["k"])
    assert st["mode"] == "delta"
    assert _view_rows(spark, cat) == _full_join(spark, cat)

    assert refresh_join_view(
        spark, cat, "s", "l", "r", "v", ["k"]
    )["status"] == "up_to_date"


def test_rebuild_on_nonappend_commit(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    l = cat.create_table("s", "l", L_SCHEMA)
    r = cat.create_table("s", "r", R_SCHEMA)
    l.append(_mk(spark, L_SCHEMA, [(1, 10.0), (2, 20.0)]))
    r.append(_mk(spark, R_SCHEMA, [(1, "a"), (2, "b")]))
    refresh_join_view(spark, cat, "s", "l", "r", "v", ["k"])
    l.delete_where(spark, "k = 2")  # rewrite: append-only broken
    l.append(_mk(spark, L_SCHEMA, [(3, 30.0)]))
    r.append(_mk(spark, R_SCHEMA, [(3, "c")]))
    st = refresh_join_view(spark, cat, "s", "l", "r", "v", ["k"])
    assert st["mode"] == "full"
    assert _view_rows(spark, cat) == _full_join(spark, cat)


def test_projection(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    l = cat.create_table("s", "l", L_SCHEMA)
    r = cat.create_table("s", "r", R_SCHEMA)
    l.append(_mk(spark, L_SCHEMA, [(1, 10.0)]))
    r.append(_mk(spark, R_SCHEMA, [(1, "a")]))
    refresh_join_view(
        spark, cat, "s", "l", "r", "v2", ["k"], select=["k", "seg"]
    )
    assert [f.name for f in cat.table("s", "v2").schema.fields] == [
        "k", "seg",
    ]
