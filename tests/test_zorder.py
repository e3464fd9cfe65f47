"""Z-order clustering: key correctness + the layout effect it exists
for — after compact(zorder_by=[a, b]), per-file min/max stats prune
selective filters on EITHER column, where a lexicographic sort only
serves its leading column."""

import pytest
from pyspark.sql import functions as F

from medallion_architecture_using_apache_iceberg_table_buckets_spark.functions.zorder import (
    zorder_key,
    zorder_sql,
)
from medallion_architecture_using_apache_iceberg_table_buckets_spark.lakehouse import (
    Catalog,
)


def _interleave(x, y, bits=16):
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_reference_bits(spark):
    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (7, 100)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r.x, r.y): r.z for r in df.select("x", "y", zorder_key(["x", "y"]).alias("z")).collect()}
    for x, y in rows:
        assert got[(x, y)] == _interleave(x, y), (x, y)


def test_zorder_sql_twin_agrees(spark):
    import duckdb

    rows = [(i * 37 % 65536, i * 101 % 65536) for i in range(200)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = sorted(r.z for r in df.select(zorder_key(["x", "y"]).alias("z")).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " +
                ",".join(f"({x},{y})" for x, y in rows) + ") v(x, y)")
    want = sorted(r[0] for r in con.execute(
        f"SELECT {zorder_sql(['x', 'y'])} FROM t").fetchall())
    assert got == want


def test_zorder_validation():
    with pytest.raises(ValueError):
        zorder_key(["x"])
    with pytest.raises(ValueError):
        zorder_key(["x", "y", "z", "w"], bits=16)
    with pytest.raises(ValueError):
        zorder_sql(["x"], bits=16)


def test_compact_zorder_prunes_both_dims(spark, tmp_path):
    # 32x32 grid appended in row-major shards: before clustering every
    # file spans the full y range, so a y filter prunes nothing.
    cat = Catalog(tmp_path / "wh")
    schema = spark.createDataFrame([], "x long, y long, v long").schema
    t = cat.create_table("d", "zt", schema)
    rows = [(x, y, x * 32 + y) for x in range(32) for y in range(32)]
    for x0 in range(0, 32, 8):
        chunk = [(x, y, v) for x, y, v in rows if x0 <= x < x0 + 8]
        t.append(spark.createDataFrame(chunk, "x long, y long, v long").coalesce(1))

    before = t.current_snapshot().files
    assert len(before) == 4
    # row-major layout: x filters prune, y filters cannot
    assert len(t._prune_files_by_stats(spark, before, "x < 8")) == 1
    assert len(t._prune_files_by_stats(spark, before, "y < 8")) == 4

    t.compact(spark, target_partitions=4, zorder_by=["x", "y"], zorder_bits=8)
    after = t.current_snapshot().files
    assert len(after) == 4
    kept_x = t._prune_files_by_stats(spark, after, "x < 8")
    kept_y = t._prune_files_by_stats(spark, after, "y < 8")
    # Morton order: both dimensions now prune (each quadrant-range
    # filter admits a strict subset of files)
    assert len(kept_x) < len(after)
    assert len(kept_y) < len(after)
    # and the data survived the rewrite intact
    got = {(r.x, r.y, r.v) for r in t.read(spark).collect()}
    assert got == set(rows)
