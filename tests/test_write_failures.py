"""Gray-failure injection on the write path: writers that die between
staging, rename, and commit must never corrupt table state, and
maintenance must clean up after them without racing live writers."""

import pytest
from pyspark.sql import types as T

from medallion_architecture_using_apache_iceberg_table_buckets_spark.lakehouse import (
    Catalog,
)

SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
)


def make(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_death_before_commit_leaves_readable_table(spark, tmp_path):
    """Files renamed into data/ but never committed are invisible to
    reads and collectable as orphans."""
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "t", SCHEMA)
    t.append(make(spark, [(1, "a")]))
    # simulate a writer that finished _write_files then died: data
    # files land in data/ with no snapshot referencing them
    orphaned = t._write_files(make(spark, [(2, "ghost")]), [])
    assert orphaned
    assert {r["id"] for r in t.read(spark).collect()} == {1}
    # young orphans are protected (could be an in-flight writer)...
    assert t.vacuum(dry_run=True) == []
    # ...but a forced vacuum collects exactly them
    assert t.vacuum(dry_run=True, older_than_seconds=0) == sorted(orphaned)
    t.vacuum(older_than_seconds=0)
    assert {r["id"] for r in t.read(spark).collect()} == {1}


def test_death_before_rename_leaves_staging_dir(spark, tmp_path):
    """A crash inside the staged write leaves _staging-*; vacuum
    sweeps it only past the retention window."""
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "t", SCHEMA)
    t.append(make(spark, [(1, "a")]))
    staging = t.root / "_staging-deadbeef"
    staging.mkdir()
    (staging / "part-0.parquet").write_bytes(b"partial")
    assert t.vacuum(dry_run=True) == []  # fresh: protected
    removed = t.vacuum(older_than_seconds=0)
    assert "_staging-deadbeef" in removed
    assert not staging.exists()
    assert t.read(spark).count() == 1


def test_concurrent_commit_detected(spark, tmp_path):
    """Optimistic concurrency: a commit racing another writer's
    completed commit must fail loudly, not silently drop it."""
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "t", SCHEMA)
    t.append(make(spark, [(1, "a")]))
    base = t._current_version()
    t.append(make(spark, [(2, "b")]))  # another writer wins the race
    with pytest.raises(RuntimeError, match="concurrent commit"):
        t._next_snapshot("append", t.current_snapshot().files, [], [], SCHEMA, base)
    # loser's failure left the winner's state intact
    assert {r["id"] for r in t.read(spark).collect()} == {1, 2}
