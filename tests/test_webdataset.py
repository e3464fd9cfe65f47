"""WebDataset tar-shard source/sink (pipeline/webdataset.py).

The reference pipeline ingests CSV only (scripts/raw-bronze.py:69-101);
tar shards are part of the LLM-curation extension surface — these
tests pin the container round trip, determinism, grouping rule, and
loud failure on truncation.
"""

import io
import tarfile

import pytest

from medallion_architecture_using_apache_iceberg_table_buckets_spark.pipeline.webdataset import (
    assemble_samples,
    read_shard_members,
    write_shards,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_webdataset_round_trip_and_grouping(spark):
    rows = [(i, f"doc {i} body " + "x" * (i % 7)) for i in range(10)]
    shards = write_shards(_docs(spark, rows), samples_per_shard=4)
    got = {r["shard_id"]: r["n_samples"] for r in shards.collect()}
    assert got == {0: 4, 1: 4, 2: 2}  # ids 0-3, 4-7, 8-9

    members = read_shard_members(shards)
    m = members.collect()
    # 2 members per sample, keys zero-padded, sizes honest
    assert len(m) == 20
    assert {r["ext"] for r in m} == {"txt", "json"}
    assert all(len(r["key"]) == 9 for r in m)
    assert all(r["size"] == len(bytes(r["payload"])) for r in m)

    samples = assemble_samples(members).collect()
    assert len(samples) == 10
    by_key = {r["key"]: r for r in samples}
    for i, text in rows:
        s = by_key[f"{i:09d}"]
        assert s["text"] == text
        assert s["n_members"] == 2
        assert f'"doc_id": {i}' in s["meta_json"]
        assert s["shard_id"] == i // 4


def test_webdataset_shards_are_deterministic(spark):
    rows = [(i, f"payload {i}") for i in range(6)]
    a = {r["shard_id"]: bytes(r["content"])
         for r in write_shards(_docs(spark, rows), samples_per_shard=3).collect()}
    b = {r["shard_id"]: bytes(r["content"])
         for r in write_shards(
             _docs(spark, list(reversed(rows))), samples_per_shard=3
         ).collect()}
    assert a == b  # input order and container noise never leak

    # the blob is a real tar any POSIX reader walks
    names = []
    with tarfile.open(fileobj=io.BytesIO(a[0]), mode="r:") as tar:
        names = [i.name for i in tar]
    assert names == [
        "000000000.json", "000000000.txt",
        "000000001.json", "000000001.txt",
        "000000002.json", "000000002.txt",
    ]


def test_webdataset_missing_member_yields_null_not_drop(spark):
    # craft a shard holding a lone .txt (no .json sidecar)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tar:
        body = b"orphan"
        info = tarfile.TarInfo(name="000000042.txt")
        info.size = len(body)
        tar.addfile(info, io.BytesIO(body))
    shards = spark.createDataFrame(
        [(7, bytearray(buf.getvalue()))], "shard_id long, content binary"
    )
    s = assemble_samples(read_shard_members(shards)).collect()
    assert len(s) == 1
    assert s[0]["text"] == "orphan"
    assert s[0]["meta_json"] is None
    assert s[0]["n_members"] == 1


def test_webdataset_malformed_shard_raises(spark):
    shards = spark.createDataFrame(
        [(1, bytearray(b"not a tar at all" * 40))],
        "shard_id long, content binary",
    )
    with pytest.raises(Exception, match="(?i)tar|read|header"):
        read_shard_members(shards).collect()
