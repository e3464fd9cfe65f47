"""SparkSession factory.

Reference parity: scripts/raw-bronze.py:102-116 and
scripts/bronze-silver.py:60-75 build a session wired to an Iceberg
``SparkCatalog`` backed by AWS S3 Table Buckets. This engine keeps
the same shape — one factory, one pluggable warehouse location — but
targets a local/offline deployment: tables live in a warehouse
directory managed by :mod:`..lakehouse` (Iceberg-style snapshot
manifests over Parquet; no proprietary services).

Scale notes (100 TB / 1000-executor design intent):
- AQE is on: runtime coalescing, skew-join splitting, and
  dynamic broadcast conversion replace hand-tuned shuffle counts.
- ``spark.sql.shuffle.partitions`` defaults to the local core count
  (env ``SPARK_GRAFT_CPUS``); on a real cluster AQE coalesces from
  a high initial number, so this is a floor not a ceiling.
- Arrow is enabled for the (rare) Pandas-UDF paths so Python
  exchange is columnar, never row-at-a-time pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "medallion-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Parameters mirror the reference's ``create_spark_session``
    (scripts/raw-bronze.py:102-116) minus the AWS-specific catalog
    wiring; catalog state is handled by ``lakehouse.Catalog``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # AQE: coalesce post-shuffle partitions, split skewed joins,
        # convert sort-merge to broadcast at runtime.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Runtime row-level filtering: build a bloom filter from the
        # selective side of large joins and push it into the probe
        # scan — at 100 TB this skips row groups the join would
        # discard anyway (explicit: the default has flipped across
        # Spark minors).
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # Columnar Python exchange for pandas UDFs.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Parquet: vectorized reader + pushdown are Spark defaults;
        # keep timestamps deterministic across engines/oracles.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # int64 micros, as the Iceberg spec mandates — INT96 (Spark's
        # legacy default) carries no footer min/max, which would make
        # timestamp columns invisible to manifest file skipping
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
