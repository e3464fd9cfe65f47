"""Bucketed (co-located) joins: pre-shuffle both sides of a hot join
key ONCE at write time, then join with zero runtime Exchange.

At 100 TB the fact-fact join (orders x lineitem) is the dominant
shuffle; bucketing both tables by the join key on write trades that
per-query shuffle for a one-time layout cost — the same play as
Iceberg's bucket partition transform feeding storage-partitioned
joins. Spark's native bucketing (``bucketBy`` + ``saveAsTable``)
records bucket metadata in the session catalog, and the planner
drops the Exchange on both sides when bucket counts match.

``write_bucketed`` / ``bucketed_join`` wrap that idiom;
``assert_no_exchange`` is used by the plan tests to pin the property
that makes it worth doing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    Sorting within buckets records sort metadata too; modern Spark
    only consumes it with the legacy flag
    ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` (and
    one file per bucket), so the guaranteed win is the eliminated
    shuffle, not the sort. ``path`` makes it an external table
    (bucket metadata still lands in the session catalog, which is
    what the planner consults).
    """
    # one file per bucket: repartition on the bucket key with the
    # bucket count (same murmur3-pmod hash as bucketBy) so each write
    # task holds exactly one bucket — Spark only trusts the sorted-
    # bucket metadata (skipping the join-time Sort) for single-file
    # buckets
    df = df.repartition(n_buckets, bucket_col)
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    if path:
        w = w.option("path", str(path))
    w.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key. With matching
    bucket counts the physical plan contains no Exchange on either
    side — verify with ``assert_no_exchange``."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def assert_no_exchange(df: DataFrame) -> None:
    """No SHUFFLE exchange: bucket layout replaced hash repartitioning
    (a BroadcastExchange would be fine — it moves the small side, not
    the bucketed data)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange hashpartitioning" in plan:
        raise AssertionError(
            f"bucketed join plan still shuffles:\n{plan}"
        )
