"""Manifest-level file skipping on per-file column stats: the scan
planner must drop files whose footer-derived min/max cannot contain a
matching row — before any data file is opened — and row-level
DELETE/UPDATE discovery must rewrite only stats-admissible files.
"""

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from medallion_architecture_using_apache_iceberg_table_buckets_spark.lakehouse import (
    Catalog,
)


def _mk(spark, tmp_path, rows, schema="k long, v double"):
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "t", spark.createDataFrame([], schema).schema)
    files = []
    for chunk in rows:
        snap = t.append(spark.createDataFrame(chunk, schema).coalesce(1))
        files.append(snap.added_files)
    return t, files


def test_stats_recorded_on_append(spark, tmp_path):
    t, files = _mk(spark, tmp_path, [[(1, 1.5), (10, 2.5)]])
    (f,) = files[0]
    st = t.current_snapshot().stats[f]
    assert st["k"][:2] == ["1", "10"]
    assert st["v"][:2] == ["1.5", "2.5"]
    assert st["k"][2] == 0 and st["k"][3] == 2  # nulls, rows


def test_prune_by_stats_ranges(spark, tmp_path):
    t, files = _mk(
        spark,
        tmp_path,
        [
            [(i, float(i)) for i in range(100)],
            [(i, float(i)) for i in range(100, 200)],
            [(i, float(i)) for i in range(200, 300)],
        ],
    )
    all_files = t.current_snapshot().files
    f1, f2, f3 = files[0][0], files[1][0], files[2][0]

    assert t._prune_files_by_stats(spark, all_files, "k = 150") == [f2]
    assert t._prune_files_by_stats(spark, all_files, "k > 250") == [f3]
    assert set(t._prune_files_by_stats(spark, all_files, "150 <= k")) == {f2, f3}
    assert t._prune_files_by_stats(spark, all_files, "k >= 100 AND k < 200") == [f2]
    assert t._prune_files_by_stats(spark, all_files, "v < 50.0") == [f1]
    # unsupported conjunct alone: conservative keep-all
    assert t._prune_files_by_stats(spark, all_files, "k % 2 = 0") == all_files
    # unsupported AND supported: the supported one still prunes
    assert t._prune_files_by_stats(spark, all_files, "k % 2 = 0 AND k = 7") == [f1]
    # a column-vs-column comparison must never be treated as literal
    assert t._prune_files_by_stats(spark, all_files, "k = v") == all_files


def test_all_null_file_pruned_for_comparisons(spark, tmp_path):
    t, files = _mk(
        spark,
        tmp_path,
        [[(1, None), (2, None)], [(3, 7.0)]],
    )
    all_files = t.current_snapshot().files
    f2 = files[1][0]
    assert t._prune_files_by_stats(spark, all_files, "v = 7.0") == [f2]
    assert t._prune_files_by_stats(spark, all_files, "v < 100.0") == [f2]


def test_delete_rewrites_only_admissible_files(spark, tmp_path):
    t, files = _mk(
        spark,
        tmp_path,
        [
            [(i, float(i)) for i in range(100)],
            [(i, float(i)) for i in range(100, 200)],
            [(i, float(i)) for i in range(200, 300)],
        ],
    )
    f1, f3 = files[0][0], files[2][0]
    snap = t.delete_where(spark, "k = 150")
    assert snap.removed_files == [files[1][0]]
    assert f1 in snap.files and f3 in snap.files
    assert t.read(spark).count() == 299
    assert t.read(spark).filter("k = 150").count() == 0


def test_scan_prunes_and_matches_full_read(spark, tmp_path):
    t, files = _mk(
        spark,
        tmp_path,
        [
            [(i, float(i)) for i in range(100)],
            [(i, float(i)) for i in range(100, 200)],
        ],
    )
    got = {r["k"] for r in t.scan(spark, "k >= 150 AND k < 160").collect()}
    assert got == set(range(150, 160))
    # and the planner really dropped the first file
    kept = t._prune_files_by_stats(
        spark, t.current_snapshot().files, "k >= 150 AND k < 160"
    )
    assert kept == [files[1][0]]


def test_timestamp_stats_prune(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    base = dt.datetime(2024, 1, 1)
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "ts_t", schema)
    fs = []
    for day in (1, 10):
        snap = t.append(
            spark.createDataFrame(
                [(day, base.replace(day=day)), (day + 1, base.replace(day=day + 1))],
                schema,
            ).coalesce(1)
        )
        fs.append(snap.added_files[0])
    kept = t._prune_files_by_stats(
        spark, t.current_snapshot().files, "ts >= TIMESTAMP '2024-01-05 00:00:00'"
    )
    assert kept == [fs[1]]
