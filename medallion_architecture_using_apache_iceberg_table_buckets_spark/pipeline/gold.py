"""Silver -> Gold: aggregated marts with incremental refresh.

Completes the medallion (BASELINE.json: bronze/silver/gold). A gold
mart is a grouped aggregation over silver, stored as its own
lakehouse table. Two refresh strategies:

- ``full``: recompute the whole mart (correct for any aggregate).
- ``partition``: recompute only the mart groups whose silver
  partitions changed since the last gold build — the scale play when
  silver is partitioned on (a prefix of) the mart's group keys:
  a CDC batch that touched 3 states re-aggregates 3 states, not all.
  Implemented as: diff silver's file sets between the last-built and
  current snapshots -> affected partition values from the changed
  file paths (manifest-only, no data read) -> recompute those groups
  -> MERGE into gold on the group keys.

State (last built silver snapshot) lives in the gold table's own
properties, so the mart is self-describing.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lakehouse import Catalog
from ..lakehouse.merge import merge_into
from ..lakehouse.transforms import (
    HIVE_DEFAULT_PARTITION,
    parse_spec,
    unescape_path_name,
)


def _affected_partition_values(
    silver, last_snapshot_id: int | None, part_col: str
) -> set[str] | None:
    """Partition values touched since `last_snapshot_id`, from manifest
    file paths alone. None = unknown -> caller falls back to full
    refresh. Path segments are escapePathName()-encoded by the writer,
    so values are unescaped before being compared against column
    values; a change in the null/empty-string partition
    (__HIVE_DEFAULT_PARTITION__) is not representable as a value and
    forces the full-refresh fallback."""
    specs = {t.partition_col: t for t in parse_spec(silver.partition_by)}
    if part_col not in specs:
        return None
    cur = silver.current_snapshot()
    if last_snapshot_id is None:
        return None
    try:
        prev = silver.snapshot_by_id(last_snapshot_id)
    except KeyError:
        return None
    changed = set(cur.files).symmetric_difference(prev.files)
    vals = set()
    prefix = f"{part_col}="
    for f in changed:
        for seg in f.split("/"):
            if seg.startswith(prefix):
                raw = seg[len(prefix):]
                if raw == HIVE_DEFAULT_PARTITION:
                    return None
                vals.add(unescape_path_name(raw))
    return vals


def refresh_gold_changelog(
    spark: SparkSession,
    catalog: Catalog,
    namespace: str,
    silver_table: str,
    gold_table: str,
    group_by: Sequence[str],
    aggs: dict[str, tuple[str, str]],
) -> dict:
    """Third refresh strategy: ADDITIVE changelog maintenance.

    Reads only the rows appended to silver since the last refresh
    (``read_incremental`` — the Iceberg start/end-snapshot-id scan the
    reference uses for CDC, scripts/bronze-silver.py:149-152),
    partial-aggregates them, and folds the partials into the mart via
    MERGE on the group keys. Cost is O(delta) + O(touched groups) —
    no silver partition is ever re-read, the strictest incremental
    contract and the right one for append-only facts at 100 TB
    (``partition`` refresh re-aggregates whole partitions; this
    touches only the delta).

    Exactness: the mart carries EXACT accumulator columns
    (``_acc_<out>[_cnt]``: decimal sums, long counts, raw min/max)
    and recomputes the presented columns from them after every fold,
    so N incremental refreshes produce bit-identical results to one
    full recompute — no rounded-value drift. Supported aggregates:
    count/sum/min/max/avg (distributive or algebraic; append-only
    silver means no retractions, so min/max are safe).

    Falls back to a full rebuild when the snapshot range crosses a
    non-append commit (compaction, MERGE) — the same rule
    read_incremental enforces.
    """
    silver = catalog.table(namespace, silver_table)
    silver_snap = silver.latest_snapshot_id()
    keys = list(group_by)

    acc_exprs, present = [], []
    combiners: dict[str, str] = {}
    for out, (col, fn) in aggs.items():
        if fn == "count":
            acc_exprs.append(
                F.count("*" if col == "*" else col).cast("long")
                .alias(f"_acc_{out}")
            )
            combiners[f"_acc_{out}"] = "sum"
            present.append(F.col(f"_acc_{out}").alias(out))
        elif fn == "sum":
            acc_exprs.append(
                F.sum(F.col(col).cast("decimal(28,6)"))
                .cast("decimal(28,6)").alias(f"_acc_{out}")
            )
            combiners[f"_acc_{out}"] = "sum"
            present.append(
                F.round(F.col(f"_acc_{out}").cast("double"), 4).alias(out)
            )
        elif fn == "avg":
            acc_exprs.append(
                F.sum(F.col(col).cast("decimal(28,6)"))
                .cast("decimal(28,6)").alias(f"_acc_{out}")
            )
            acc_exprs.append(
                F.count(col).cast("long").alias(f"_acc_{out}_cnt")
            )
            combiners[f"_acc_{out}"] = "sum"
            combiners[f"_acc_{out}_cnt"] = "sum"
            present.append(
                F.round(
                    F.col(f"_acc_{out}").cast("double")
                    / F.col(f"_acc_{out}_cnt"),
                    4,
                ).alias(out)
            )
        elif fn in ("min", "max"):
            acc_exprs.append(getattr(F, fn)(col).alias(f"_acc_{out}"))
            combiners[f"_acc_{out}"] = fn
            present.append(
                F.round(F.col(f"_acc_{out}").cast("double"), 4).alias(out)
            )
        else:
            raise ValueError(f"unsupported aggregate: {fn}")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(*keys).agg(*acc_exprs)

    def with_presented(df: DataFrame) -> DataFrame:
        return df.select(*keys, *present, *combiners)

    exists = catalog.table_exists(namespace, gold_table)
    last_built = None
    if exists:
        props = catalog.table(namespace, gold_table).properties
        if "gold.last-silver-snapshot" in props:
            last_built = int(props["gold.last-silver-snapshot"])
        if last_built == silver_snap:
            return {"status": "up_to_date", "silver_snapshot": silver_snap}

    mode = "full"
    if exists and last_built is not None:
        try:
            delta = silver.read_incremental(spark, last_built)
            gold = catalog.table(namespace, gold_table)
            p = partial(delta).alias("p")
            g = gold.read(spark).alias("g")
            acc_types = {f.name: f.dataType for f in gold.schema.fields}
            merged_accs = []
            for acc, how in combiners.items():
                a, b = F.col(f"g.{acc}"), F.col(f"p.{acc}")
                if how == "sum":
                    zero = F.lit(0)
                    comb = F.coalesce(a, zero) + F.coalesce(b, zero)
                elif how == "min":
                    comb = F.least(a, b)  # null-skipping by spec
                else:
                    comb = F.greatest(a, b)
                merged_accs.append(comb.cast(acc_types[acc]).alias(acc))
            upserts = with_presented(
                p.join(g, on=keys, how="left")
                .select(*[F.col(k) for k in keys], *merged_accs)
            )
            merge_into(spark, gold, upserts, on=keys)
            mode = "changelog"
        except ValueError:
            mode = "full"  # non-append snapshot crossed: rebuild

    if mode == "full":
        full = with_presented(partial(silver.read(spark)))
        if not exists:
            gold = catalog.create_table(
                namespace, gold_table, full.schema, partition_by=()
            )
        else:
            gold = catalog.table(namespace, gold_table)
        gold.overwrite(full)

    base = gold._current_version()
    snap = gold._load(base)
    gold._next_snapshot(
        "set-properties",
        snap.files,
        [],
        [],
        gold.schema,
        base,
        new_properties={"gold.last-silver-snapshot": str(silver_snap)},
    )
    return {"status": "refreshed", "mode": mode, "silver_snapshot": silver_snap}


def build_gold_mart(
    spark: SparkSession,
    catalog: Catalog,
    namespace: str,
    silver_table: str,
    gold_table: str,
    group_by: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    strategy: str = "partition",
) -> dict:
    """Build/refresh a gold mart: group_by silver on `group_by` with
    `aggs` (out_col -> (in_col, fn), fn in sum/count/min/max/avg).

    Returns a status dict with the refresh mode actually used.
    """
    silver = catalog.table(namespace, silver_table)
    silver_snap = silver.latest_snapshot_id()

    agg_exprs = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            agg_exprs.append(F.count("*" if col == "*" else col).alias(out))
        elif fn == "sum":
            # exact decimal summation: the mart value must not depend
            # on partial-aggregation order (same rule as the oracle-
            # checked queries)
            agg_exprs.append(
                F.round(
                    F.sum(F.col(col).cast("decimal(18,4)")).cast("double"), 4
                ).alias(out)
            )
        elif fn == "avg":
            agg_exprs.append(
                F.round(
                    F.sum(F.col(col).cast("decimal(18,4)")).cast("double")
                    / F.count(col),
                    4,
                ).alias(out)
            )
        elif fn in ("min", "max"):
            agg_exprs.append(
                F.round(getattr(F, fn)(col).cast("double"), 4).alias(out)
            )
        else:
            raise ValueError(f"unsupported aggregate: {fn}")

    def aggregate(df: DataFrame) -> DataFrame:
        return df.groupBy(*group_by).agg(*agg_exprs)

    exists = catalog.table_exists(namespace, gold_table)
    last_built = None
    if exists:
        props = catalog.table(namespace, gold_table).properties
        if "gold.last-silver-snapshot" in props:
            last_built = int(props["gold.last-silver-snapshot"])
        if last_built == silver_snap:
            return {"status": "up_to_date", "silver_snapshot": silver_snap}

    affected = (
        _affected_partition_values(silver, last_built, group_by[0])
        if strategy == "partition" and exists
        else None
    )

    if affected is not None and exists:
        gold = catalog.table(namespace, gold_table)
        if affected:
            # recompute ONLY the affected silver partitions (the
            # expensive side); replace those groups in the mart.
            # Vanished groups disappear too — a merge-only upsert
            # would leave stale rows for partitions deleted upstream.
            changed = aggregate(
                silver.read(spark).filter(F.col(group_by[0]).isin(*affected))
            )
            # NULL-keyed mart rows: ~isin(...) is NULL for them, which
            # would silently drop the null group on every incremental
            # refresh — keep it explicitly (a changed null partition
            # already forced the full-refresh fallback above).
            remaining = gold.read(spark).filter(
                ~F.col(group_by[0]).isin(*affected)
                | F.col(group_by[0]).isNull()
            )
            gold.overwrite(remaining.unionByName(changed))
        mode = f"incremental({len(affected)} partitions)"
    else:
        full = aggregate(silver.read(spark))
        if not exists:
            gold = catalog.create_table(
                namespace, gold_table, full.schema, partition_by=()
            )
        else:
            gold = catalog.table(namespace, gold_table)
        gold.overwrite(full)
        mode = "full"

    # record the silver snapshot this mart reflects
    base = gold._current_version()
    snap = gold._load(base)
    gold._next_snapshot(
        "set-properties",
        snap.files,
        [],
        [],
        gold.schema,
        base,
        new_properties={"gold.last-silver-snapshot": str(silver_snap)},
    )
    return {"status": "refreshed", "mode": mode, "silver_snapshot": silver_snap}
