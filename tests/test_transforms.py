"""Hidden partition transforms: bucket(N, key) and days(ts)."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from medallion_architecture_using_apache_iceberg_table_buckets_spark.lakehouse import (
    Catalog,
    merge_into,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def make(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


import datetime as dt

ROWS = [(i, f"v{i}", dt.datetime(2024, 1, 1 + i % 3)) for i in range(40)]


def test_bucket_write_read_hidden(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "t", SCHEMA, partition_by=["bucket(4, id)"])
    t.append(make(spark, ROWS))
    files = t.current_snapshot().files
    assert all("_p_id_bucket=" in f for f in files)
    assert len({f.split("/")[0] for f in files}) > 1  # multiple buckets
    out = t.read(spark)
    assert out.schema == SCHEMA  # hidden col not surfaced
    assert out.count() == 40


def test_days_transform(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "t2", SCHEMA, partition_by=["days(ts)"])
    t.append(make(spark, ROWS))
    files = t.current_snapshot().files
    assert all("_p_ts_day=2024-01-0" in f for f in files)
    assert t.read(spark).schema == SCHEMA
    # day-partition pruning reaches the scan via the hidden dirs
    assert t.read(spark).filter(F.col("ts") >= "2024-01-03").count() == len(
        [r for r in ROWS if r[2] >= dt.datetime(2024, 1, 3)]
    )


def test_merge_prunes_to_source_buckets(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "t3", SCHEMA, partition_by=["bucket(8, id)"])
    t.append(make(spark, ROWS))
    before = set(t.current_snapshot().files)
    merge_into(spark, t, make(spark, [(0, "upd", dt.datetime(2024, 2, 1))]), on="id")
    snap = t.current_snapshot()
    # id=0's bucket
    bucket_dir = [f.split("/")[0] for f in snap.removed_files]
    assert len(snap.removed_files) >= 1
    assert len(set(bucket_dir)) == 1  # only one bucket touched
    # all other buckets' files untouched
    untouched = {f for f in before if f.split("/")[0] != bucket_dir[0]}
    assert untouched <= set(snap.files)
    rows = {r["id"]: r["v"] for r in t.read(spark).collect()}
    assert rows[0] == "upd" and len(rows) == 40


def test_bucket_hash_matches_iceberg_spec_vectors(spark):
    """The bucket transform's hash must be Iceberg's murmur3_32 with
    the spec's per-type serialization — checked against every
    published Appendix-B test vector, through all three
    implementations (pure Python, codegen Column, pandas-UDF Column).
    Reference creates its tables with Iceberg bucket partitioning
    (scripts/raw-bronze.py): spec-true values make our exported
    metadata readable by a real runtime without a rewrite."""
    import decimal
    import uuid

    from medallion_architecture_using_apache_iceberg_table_buckets_spark.lakehouse import (
        murmur3 as M,
    )

    tz = dt.timezone(dt.timedelta(hours=-8))
    vectors = [
        (34, T.IntegerType(), 2017239379),
        (34, T.LongType(), 2017239379),
        (decimal.Decimal("14.20"), T.DecimalType(9, 2), -500754589),
        (dt.date(2017, 11, 16), T.DateType(), -653330422),
        (dt.datetime(2017, 11, 16, 22, 31, 8), T.TimestampNTZType(), -2047944441),
        (dt.datetime(2017, 11, 16, 14, 31, 8, tzinfo=tz), T.TimestampType(), -2047944441),
        ("iceberg", T.StringType(), 1210000089),
        (b"\x00\x01\x02\x03", T.BinaryType(), -188683207),
    ]
    for v, dtype, want in vectors:
        assert M.hash_bytes(M.serialize(v, dtype)) == want, (v, dtype)
    # uuid serialization (16-byte big-endian) has its own vector
    u = uuid.UUID("f79c3e09-677c-4bbd-a479-3f349cb785e7")
    assert M.hash_bytes(M.serialize(u, T.StringType())) == 1488055340
    # time type (no Spark equivalent): micros-long promotion vector
    assert M.hash_long(81068000000) == -662762989

    # Column paths reproduce the Python reference bit-for-bit,
    # including negative/extreme longs and the int->long promotion
    longs = [34, 0, -1, -34, 2**62, -(2**62), (1 << 63) - 1, -(1 << 63)]
    df = spark.createDataFrame([(v,) for v in longs], "v long")
    got = [r[0] for r in df.select(M.murmur3_long_col(F.col("v"))).collect()]
    assert got == [M.hash_long(v) for v in longs]

    row = (
        spark.createDataFrame(
            [(34, dt.date(2017, 11, 16), dt.datetime(2017, 11, 16, 22, 31, 8),
              "iceberg", decimal.Decimal("14.20")), (None,) * 5],
            "i int, d date, ts timestamp_ntz, s string, m decimal(9,2)",
        )
        .select(
            M.bucket_col(F.col("i"), T.IntegerType(), 16).alias("bi"),
            M.bucket_col(F.col("d"), T.DateType(), 16).alias("bd"),
            M.bucket_col(F.col("ts"), T.TimestampNTZType(), 16).alias("bts"),
            M.bucket_col(F.col("s"), T.StringType(), 16).alias("bs"),
            M.bucket_col(F.col("m"), T.DecimalType(9, 2), 16).alias("bm"),
        )
        .collect()
    )
    bucketed, nulls = row
    assert (bucketed["bi"], bucketed["bd"], bucketed["bts"]) == (
        (2017239379 & 0x7FFFFFFF) % 16,
        (-653330422 & 0x7FFFFFFF) % 16,
        (-2047944441 & 0x7FFFFFFF) % 16,
    )
    assert (bucketed["bs"], bucketed["bm"]) == (
        (1210000089 & 0x7FFFFFFF) % 16,
        (-500754589 & 0x7FFFFFFF) % 16,
    )
    # Iceberg's null partition: null key -> null bucket on every path
    assert all(nulls[c] is None for c in ("bi", "bd", "bts", "bs", "bm"))


def test_merge_bucket_correctness_update_insert_delete(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "t4", SCHEMA, partition_by=["bucket(4, id)"])
    t.append(make(spark, ROWS))
    src = spark.createDataFrame(
        [
            ("U", 1, "u1", dt.datetime(2024, 3, 1)),
            ("I", 999, "new", dt.datetime(2024, 3, 1)),
            ("D", 2, None, None),
        ],
        "Op string, id long, v string, ts timestamp",
    )
    merge_into(spark, t, src, on="id", delete_predicate="Op = 'D'")
    rows = {r["id"]: r["v"] for r in t.read(spark).collect()}
    assert rows[1] == "u1"
    assert rows[999] == "new"
    assert 2 not in rows
    assert len(rows) == 40  # 40 - 1 deleted + 1 inserted
