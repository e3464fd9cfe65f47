"""Driver-contract drift guards: every queries() entry has an oracle
(or is on the known approximate list), names are aligned, and small
behavior checks for the new compaction/CSV options."""

import pytest
from pyspark.sql import types as T

import __spark_entry__ as entry

def test_every_query_has_oracle():
    qs, oracles = set(entry.queries()), set(entry.oracle_sql())
    assert oracles <= qs, f"oracles without queries: {oracles - qs}"
    assert qs == oracles, f"queries without oracles: {qs - oracles}"


def test_query_count_floor():
    # coverage must not silently shrink between rounds
    assert len(entry.queries()) >= 100


def test_sorted_compaction_clusters(spark, tmp_path):
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.lakehouse import Catalog

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
    )
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "t", schema)
    t.append(spark.createDataFrame([(i % 97, i) for i in range(5000)], schema))
    t.compact(spark, target_partitions=4, sort_by=["id"])
    files = t.current_snapshot().files
    assert len(files) == 4
    # range clustering: per-file id ranges must be (near) disjoint
    import pyarrow.parquet as pq

    ranges = []
    for f in files:
        md = pq.ParquetFile(t.data_root / f)
        col = md.metadata.row_group(0).column(0).statistics
        ranges.append((col.min, col.max))
    ranges.sort()
    overlaps = sum(1 for a, b in zip(ranges, ranges[1:]) if a[1] > b[0])
    assert overlaps == 0
    assert t.read(spark).count() == 5000


def test_csv_modes(spark, tmp_path):
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.pipeline.ingest import (
        read_csv_batch,
    )

    f = tmp_path / "x.csv"
    f.write_text("id\tprice\n1\t2.5\nbad\tnotanumber\n3\t4.5\n")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("price", T.DoubleType())]
    )
    permissive = read_csv_batch(spark, [str(f)], schema=schema).collect()
    assert len(permissive) == 3  # bad row null-filled
    dropped = read_csv_batch(
        spark, [str(f)], schema=schema, mode="DROPMALFORMED"
    ).collect()
    assert {r["id"] for r in dropped} == {1, 3}
    quarantined = read_csv_batch(
        spark, [str(f)], schema=schema, corrupt_record_col="_bad"
    )
    bad = [r for r in quarantined.collect() if r["_bad"] is not None]
    assert len(bad) == 1 and "notanumber" in bad[0]["_bad"]
    with pytest.raises(Exception):
        read_csv_batch(spark, [str(f)], schema=schema, mode="FAILFAST").collect()
