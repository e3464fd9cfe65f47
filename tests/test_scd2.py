"""SCD type-2 operators: history build from a changelog and
incremental dimension maintenance through file-scoped COW MERGE."""

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from medallion_architecture_using_apache_iceberg_table_buckets_spark.lakehouse import (
    Catalog,
)
from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.scd import (
    scd2_apply,
    scd2_history,
)


def ts(h):
    return dt.datetime(2024, 1, 1, h)


CHANGELOG_SCHEMA = (
    "user_id long, event_type string, ts timestamp, event_id long"
)


def test_scd2_history_collapses_runs(spark):
    rows = [
        (1, "a", ts(1), 1),
        (1, "a", ts(2), 2),  # same status: same version
        (1, "b", ts(3), 3),
        (1, "a", ts(4), 4),  # back to a: NEW version (not merged)
        (2, "x", ts(5), 5),
    ]
    out = scd2_history(
        spark.createDataFrame(rows, CHANGELOG_SCHEMA),
        ["user_id"], "event_type", "ts", tie_cols=["event_id"],
    ).orderBy("user_id", "version").collect()
    got = [
        (r["user_id"], r["version"], r["event_type"],
         r["valid_from"], r["valid_to"], r["is_current"])
        for r in out
    ]
    assert got == [
        (1, 1, "a", ts(1), ts(3), False),
        (1, 2, "b", ts(3), ts(4), False),
        (1, 3, "a", ts(4), None, True),
        (2, 1, "x", ts(5), None, True),
    ]


def test_scd2_history_intervals_partition_time(spark):
    """Intervals are half-open and contiguous: every event ts falls in
    exactly one version's [valid_from, valid_to)."""
    import random

    rng = random.Random(7)
    rows = [
        (u, rng.choice("abc"), dt.datetime(2024, 1, 1) +
         dt.timedelta(minutes=i), i)
        for i, u in enumerate(rng.choices(range(5), k=200))
    ]
    df = spark.createDataFrame(rows, CHANGELOG_SCHEMA)
    hist = scd2_history(df, ["user_id"], "event_type", "ts",
                        tie_cols=["event_id"])
    joined = df.alias("e").join(
        hist.alias("h"),
        (F.col("e.user_id") == F.col("h.user_id"))
        & (F.col("e.ts") >= F.col("h.valid_from"))
        & (F.col("h.valid_to").isNull()
           | (F.col("e.ts") < F.col("h.valid_to"))),
    )
    # exactly one covering version per event, with the right status
    assert joined.count() == len(rows)
    assert joined.filter(
        F.col("e.event_type") != F.col("h.event_type")
    ).count() == 0
    # exactly one current row per key
    cur = hist.filter("is_current").groupBy("user_id").count()
    assert cur.filter("count != 1").count() == 0


DIM_SCHEMA = T.StructType([
    T.StructField("cust_id", T.LongType()),
    T.StructField("segment", T.StringType()),
    T.StructField("region", T.StringType()),
    T.StructField("valid_from", T.TimestampType()),
    T.StructField("valid_to", T.TimestampType()),
    T.StructField("is_current", T.BooleanType()),
])


def _dim_table(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "dim", DIM_SCHEMA)
    t.append(spark.createDataFrame(
        [
            (1, "gold", "eu", ts(0), None, True),
            (2, "silver", "us", ts(0), None, True),
        ],
        DIM_SCHEMA,
    ))
    return t


def _upd(spark, rows):
    return spark.createDataFrame(
        rows, "cust_id long, segment string, region string, eff timestamp"
    )


def test_scd2_apply_closes_and_opens(spark, tmp_path):
    t = _dim_table(spark, tmp_path)
    scd2_apply(
        spark, t,
        _upd(spark, [
            (1, "platinum", "eu", ts(5)),   # changed -> new version
            (2, "silver", "us", ts(5)),     # unchanged -> no-op
            (3, "bronze", "ap", ts(5)),     # new key -> first version
        ]),
        ["cust_id"], ["segment", "region"], "eff",
    )
    rows = {
        (r["cust_id"], r["valid_from"]): r
        for r in t.read(spark).collect()
    }
    assert len(rows) == 4
    closed = rows[(1, ts(0))]
    assert closed["is_current"] is False and closed["valid_to"] == ts(5)
    assert closed["segment"] == "gold"
    opened = rows[(1, ts(5))]
    assert opened["is_current"] is True and opened["segment"] == "platinum"
    untouched = rows[(2, ts(0))]
    assert untouched["is_current"] is True and untouched["valid_to"] is None
    first = rows[(3, ts(5))]
    assert first["is_current"] is True and first["segment"] == "bronze"


def test_scd2_apply_idempotent_and_chains(spark, tmp_path):
    t = _dim_table(spark, tmp_path)
    batch = _upd(spark, [(1, "platinum", "eu", ts(5))])
    scd2_apply(spark, t, batch, ["cust_id"], ["segment", "region"], "eff")
    n1 = t.read(spark).count()
    # replaying the same batch is a no-op (values now unchanged)
    scd2_apply(spark, t, batch, ["cust_id"], ["segment", "region"], "eff")
    assert t.read(spark).count() == n1
    # a second real change chains a third version
    scd2_apply(
        spark, t, _upd(spark, [(1, "platinum", "ap", ts(9))]),
        ["cust_id"], ["segment", "region"], "eff",
    )
    hist = sorted(
        (r["valid_from"], r["valid_to"], r["is_current"], r["region"])
        for r in t.read(spark).filter("cust_id = 1").collect()
    )
    assert hist == [
        (ts(0), ts(5), False, "eu"),
        (ts(5), ts(9), False, "eu"),
        (ts(9), None, True, "ap"),
    ]


def test_scd2_apply_null_tracked_values(spark, tmp_path):
    """eqNullSafe: null -> value and value -> null both count as
    changes; null -> null does not."""
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "dimn", DIM_SCHEMA)
    t.append(spark.createDataFrame(
        [(1, None, "eu", ts(0), None, True)], DIM_SCHEMA
    ))
    # null -> null, region unchanged: no-op
    scd2_apply(spark, t, _upd(spark, [(1, None, "eu", ts(2))]),
               ["cust_id"], ["segment", "region"], "eff")
    assert t.read(spark).count() == 1
    # null -> gold: a change
    scd2_apply(spark, t, _upd(spark, [(1, "gold", "eu", ts(3))]),
               ["cust_id"], ["segment", "region"], "eff")
    assert t.read(spark).count() == 2
    assert (
        t.read(spark).filter("is_current").collect()[0]["segment"] == "gold"
    )


def test_scd2_apply_is_file_scoped(spark, tmp_path):
    """The merge rewrites only files holding a changed key's current
    row — other files carry over untouched in the manifest."""
    t = _dim_table(spark, tmp_path)
    # second append lands in separate files
    t.append(spark.createDataFrame(
        [(9, "gold", "eu", ts(0), None, True)], DIM_SCHEMA
    ))
    before = set(t.current_snapshot().files)
    scd2_apply(spark, t, _upd(spark, [(9, "gold", "ap", ts(4))]),
               ["cust_id"], ["segment", "region"], "eff")
    snap = t.current_snapshot()
    # files from the first append (keys 1,2) survive unchanged
    untouched = before & set(snap.files)
    assert untouched, "merge rewrote every file — not file-scoped"
    assert set(snap.removed_files) <= before - untouched | before
    assert len(snap.removed_files) < len(before)
