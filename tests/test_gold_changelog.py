"""Additive changelog refresh of gold marts: O(delta) maintenance
that stays bit-identical to a full recompute."""

from pyspark.sql import types as T

from medallion_architecture_using_apache_iceberg_table_buckets_spark.lakehouse import (
    Catalog,
)
from medallion_architecture_using_apache_iceberg_table_buckets_spark.pipeline.gold import (
    build_gold_mart,
    refresh_gold_changelog,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ]
)

AGGS = {
    "n": ("*", "count"),
    "total": ("v", "sum"),
    "avg_v": ("v", "avg"),
    "lo": ("v", "min"),
    "hi": ("v", "max"),
}


def _mart_rows(spark, cat):
    gold = cat.table("s", "gold")
    return {
        r["k"]: (r["n"], r["total"], r["avg_v"], r["lo"], r["hi"])
        for r in gold.read(spark).collect()
    }


def _full_recompute(spark, cat, tmp):
    """Reference: one-shot full build into a scratch mart."""
    refresh_gold_changelog(
        spark, cat, "s", "silver", f"scratch_{tmp}", ["k"], AGGS
    )
    gold = cat.table("s", f"scratch_{tmp}")
    out = {
        r["k"]: (r["n"], r["total"], r["avg_v"], r["lo"], r["hi"])
        for r in gold.read(spark).collect()
    }
    cat.drop_table("s", f"scratch_{tmp}")
    return out


def test_changelog_refresh_matches_full_recompute(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    silver = cat.create_table("s", "silver", SCHEMA)
    silver.append(spark.createDataFrame(
        [("a", 1.25), ("a", 2.5), ("b", 10.0)], SCHEMA))
    st = refresh_gold_changelog(spark, cat, "s", "silver", "gold", ["k"], AGGS)
    assert st["mode"] == "full"  # first build
    assert _mart_rows(spark, cat)["a"] == (2, 3.75, 1.875, 1.25, 2.5)

    # three incremental batches, each folded additively
    for i, batch in enumerate([
        [("a", 0.125), ("c", 7.0)],
        [("b", -3.0)],
        [("c", 7.0), ("a", 100.0)],
    ]):
        silver.append(spark.createDataFrame(batch, SCHEMA))
        st = refresh_gold_changelog(
            spark, cat, "s", "silver", "gold", ["k"], AGGS
        )
        assert st["mode"] == "changelog", st
        assert _mart_rows(spark, cat) == _full_recompute(spark, cat, i)


def test_changelog_touches_only_delta_groups(spark, tmp_path):
    """The fold merges only groups present in the delta — untouched
    mart rows are carried over in the manifest, not rewritten."""
    cat = Catalog(tmp_path / "wh")
    silver = cat.create_table("s", "silver", SCHEMA)
    silver.append(spark.createDataFrame(
        [(f"k{i}", float(i)) for i in range(8)], SCHEMA))
    refresh_gold_changelog(spark, cat, "s", "silver", "gold", ["k"], AGGS)
    gold = cat.table("s", "gold")
    # spread the mart over several files so untouched ones can survive
    gold.overwrite(gold.read(spark).repartition(4))
    before = set(gold.current_snapshot().files)
    silver.append(spark.createDataFrame([("k3", 99.0)], SCHEMA))
    st = refresh_gold_changelog(spark, cat, "s", "silver", "gold", ["k"], AGGS)
    assert st["mode"] == "changelog"
    after = set(gold.current_snapshot().files)
    assert before & after, "changelog fold rewrote the whole mart"
    assert _mart_rows(spark, cat)["k3"][0] == 2


def test_changelog_up_to_date_shortcircuit(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    silver = cat.create_table("s", "silver", SCHEMA)
    silver.append(spark.createDataFrame([("a", 1.0)], SCHEMA))
    refresh_gold_changelog(spark, cat, "s", "silver", "gold", ["k"], AGGS)
    st = refresh_gold_changelog(spark, cat, "s", "silver", "gold", ["k"], AGGS)
    assert st["status"] == "up_to_date"


def test_changelog_falls_back_on_rewrite(spark, tmp_path):
    """A compaction between refreshes breaks the append-only contract
    -> full rebuild, still correct."""
    cat = Catalog(tmp_path / "wh")
    silver = cat.create_table("s", "silver", SCHEMA)
    silver.append(spark.createDataFrame([("a", 1.0), ("b", 2.0)], SCHEMA))
    refresh_gold_changelog(spark, cat, "s", "silver", "gold", ["k"], AGGS)
    silver.append(spark.createDataFrame([("a", 5.0)], SCHEMA))
    silver.compact(spark)
    st = refresh_gold_changelog(spark, cat, "s", "silver", "gold", ["k"], AGGS)
    assert st["mode"] == "full"
    assert _mart_rows(spark, cat)["a"] == (2, 6.0, 3.0, 1.0, 5.0)


def test_changelog_and_partition_strategies_agree(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    silver = cat.create_table("s", "silver", SCHEMA, partition_by=["k"])
    silver.append(spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 3.5)], SCHEMA))
    refresh_gold_changelog(spark, cat, "s", "silver", "gold", ["k"], AGGS)
    build_gold_mart(
        spark, cat, "s", "silver", "gold2", ["k"],
        {"n": ("*", "count"), "total": ("v", "sum")},
    )
    silver.append(spark.createDataFrame([("b", 8.0)], SCHEMA))
    refresh_gold_changelog(spark, cat, "s", "silver", "gold", ["k"], AGGS)
    build_gold_mart(
        spark, cat, "s", "silver", "gold2", ["k"],
        {"n": ("*", "count"), "total": ("v", "sum")},
    )
    a = {
        r["k"]: (r["n"], r["total"])
        for r in cat.table("s", "gold").read(spark)
        .select("k", "n", "total").collect()
    }
    b = {
        r["k"]: (r["n"], r["total"])
        for r in cat.table("s", "gold2").read(spark).collect()
    }
    assert a == b
