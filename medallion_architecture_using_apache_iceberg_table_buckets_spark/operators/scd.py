"""Slowly-changing-dimension type-2 (SCD2) operators.

The medallion silver->gold step the reference's pipeline stops short
of: its silver layer keeps only the LATEST row per key
(keep-latest-per-key dedup + MERGE, scripts/bronze-silver.py:254-269),
which is SCD type 1 — history is destroyed. Type 2 keeps every
version with a validity interval, the standard shape for dimension
tables feeding analytics and for temporally-correct training-data
joins (as-of joins against attribute history).

Two forms:

- :func:`scd2_history` — BUILD the full type-2 history from an
  append-only changelog in one pass (two key-local window shuffles,
  no driver-side state; scales with the changelog, not with key
  cardinality).
- :func:`scd2_apply` — MAINTAIN a live SCD2 dimension table
  incrementally: a micro-batch of new attribute snapshots closes out
  changed current rows and opens new versions through the engine's
  file-scoped copy-on-write MERGE (O(touched files), not O(table)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    status_col: str,
    ts_col: str,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Changelog -> type-2 history with one row per VALUE RUN.

    Consecutive events carrying the same ``status_col`` value for a
    key collapse into one version (a new version opens only when the
    tracked value actually changes — the SCD2 contract). Output per
    version: keys, ``version`` (1-based per key), the tracked value,
    ``valid_from`` (first event ts of the run), ``valid_to`` (next
    version's valid_from, null while current) and ``is_current``.

    Plan shape: lag + running-count over (key, ts) to label runs,
    one aggregation per (key, run), lead over (key, valid_from) for
    the interval close — every shuffle is keyed by the dimension key,
    so 100 TB of changelog partitions cleanly and no single task sees
    more than one key's history.

    ``tie_cols`` break equal-timestamp ordering deterministically
    (pass the changelog's sequence/id column).
    """
    ties = list(tie_cols or [])
    order = [F.col(ts_col), *[F.col(c) for c in ties]]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    changed = (
        F.lag(status_col).over(w).isNull()
        | (F.lag(status_col).over(w) != F.col(status_col))
    ).cast("int")
    runs = df.withColumn(
        "_run",
        F.sum(changed).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    versions = runs.groupBy(*key_cols, "_run").agg(
        F.min(ts_col).alias("valid_from"),
        # status is constant within a run by construction
        F.first(status_col).alias(status_col),
    )
    w2 = Window.partitionBy(*key_cols).orderBy("valid_from")
    return (
        versions.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .withColumn("version", F.col("_run").cast("int"))
        .drop("_run")
        .select(
            *key_cols, "version", status_col,
            "valid_from", "valid_to", "is_current",
        )
    )


def scd2_apply(
    spark: SparkSession,
    table,
    updates: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    eff_col: str,
) -> None:
    """Apply a snapshot micro-batch to a live SCD2 dimension table.

    ``table`` columns: ``key_cols + tracked_cols + valid_from +
    valid_to + is_current``. ``updates`` carries one row per key:
    ``key_cols + tracked_cols + eff_col`` (the new values effective at
    ``eff_col``). Keys whose tracked values are UNCHANGED are
    no-ops; changed keys get their current row closed
    (``valid_to = eff``, ``is_current = false``) and a new current
    version opened; unseen keys insert their first version.

    Both steps ride the engine's file-scoped COW MERGE on the
    composite identity ``key + valid_from`` — version rows are
    immutable once closed, so the merge only ever rewrites files
    holding a CURRENT row of a changed key (the Iceberg COW
    RowLevelCommand shape; a 100 TB dimension rewrites a handful of
    files per batch, never the table).
    """
    from ..lakehouse.merge import merge_into

    dim = table.read(spark)
    cur = dim.filter(F.col("is_current"))
    changed_or_new = updates.alias("u").join(
        cur.alias("c"), on=key_cols, how="left"
    )
    any_diff = F.lit(False)
    for c in tracked_cols:
        any_diff = any_diff | ~F.col(f"c.{c}").eqNullSafe(F.col(f"u.{c}"))
    # brand-new keys: no current row at all (key cols merge under a
    # name-list join, so probe a right-side-only column)
    is_new = F.col("c.is_current").isNull()
    relevant = changed_or_new.filter(is_new | any_diff)
    new_versions = relevant.select(
        *[F.col(k) for k in key_cols],
        *[F.col(f"u.{c}").alias(c) for c in tracked_cols],
        F.col(f"u.{eff_col}").alias("valid_from"),
        F.lit(None).cast(dim.schema["valid_to"].dataType).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    closed = relevant.filter(~is_new).select(
        *[F.col(k) for k in key_cols],
        *[F.col(f"c.{c}").alias(c) for c in tracked_cols],
        F.col("c.valid_from").alias("valid_from"),
        F.col(f"u.{eff_col}").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    # one merge: closed rows match (key, valid_from) and update in
    # place; new versions carry a fresh valid_from and insert
    batch = closed.unionByName(new_versions)
    merge_into(spark, table, batch, on=key_cols + ["valid_from"])
