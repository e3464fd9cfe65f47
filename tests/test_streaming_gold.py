"""End-to-end medallion with the additive gold strategy: file stream
-> bronze appends -> changelog-fold gold after each drain. The gold
mart stays bit-identical to a full recompute at every step."""

from pyspark.sql import types as T

from medallion_architecture_using_apache_iceberg_table_buckets_spark.lakehouse import (
    Catalog,
)
from medallion_architecture_using_apache_iceberg_table_buckets_spark.pipeline.gold import (
    refresh_gold_changelog,
)
from medallion_architecture_using_apache_iceberg_table_buckets_spark.streaming.file_ingest import (
    stream_raw_to_bronze,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ]
)

AGGS = {"n": ("*", "count"), "total": ("v", "sum")}


def _drop_file(path, rows, name):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / f"{name}.tsv", "w") as f:
        f.write("k\tv\n")
        for k, v in rows:
            f.write(f"{k}\t{v}\n")


def test_stream_then_changelog_gold(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    inbox = tmp_path / "inbox"
    ckpt = tmp_path / "ckpt"

    def drain():
        return stream_raw_to_bronze(
            spark, cat, inbox, "m", "bronze", ckpt, SCHEMA
        )

    def refresh():
        return refresh_gold_changelog(
            spark, cat, "m", "bronze", "gold", ["k"], AGGS
        )

    _drop_file(inbox, [("a", 1.0), ("b", 2.0)], "batch1")
    assert drain() >= 1
    assert refresh()["mode"] == "full"

    _drop_file(inbox, [("a", 3.0), ("c", 5.0)], "batch2")
    drain()
    assert refresh()["mode"] == "changelog"

    _drop_file(inbox, [("c", 1.5)], "batch3")
    drain()
    assert refresh()["mode"] == "changelog"

    gold = {
        r["k"]: (r["n"], r["total"])
        for r in cat.table("m", "gold").read(spark)
        .select("k", "n", "total").collect()
    }
    assert gold == {"a": (2, 4.0), "b": (1, 2.0), "c": (2, 6.5)}
    # a re-drain with no new files is a no-op end to end
    drain()
    assert refresh()["status"] == "up_to_date"
