"""Table-level data-quality constraint checking.

The lakehouse counterpart of Delta CHECK constraints / dbt tests /
Deequ verification suites: declare row predicates, uniqueness, and
referential integrity, evaluate them distributively, and get back one
small (check, kind, n_violations, ok) report row per check.

Scale shape: every ROW-LEVEL predicate — not-null, range, accepted
values, arbitrary boolean expressions — fuses into a SINGLE
aggregation pass (`sum(violated::long)` per check), so adding checks
never adds scans: one map-only projection + one scalar agg over the
table regardless of check count. Uniqueness is one key-local
count-shuffle; a foreign key is one anti-join against the (usually
far smaller, AQE-broadcastable) parent key set. The report unions
tiny 1-row frames — driver-side planning only, no data movement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_violations(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """One (check, kind, n_violations) row per named boolean
    ``violated``-when-true column, all evaluated in one scan."""
    if not checks:
        raise ValueError("no checks given")
    agg = df.agg(
        *[
            F.sum(c.cast("long")).alias(name)
            for name, c in checks.items()
        ]
    )
    pairs = [
        x
        for name in checks
        for x in (F.lit(name), F.coalesce(F.col(name), F.lit(0)))
    ]
    return agg.select(
        F.explode(F.create_map(*pairs)).alias("check", "n_violations")
    ).select("check", F.lit("row").alias("kind"), "n_violations")


def unique_violations(df: DataFrame, cols: list[str], name: str) -> DataFrame:
    """Rows sharing their key with at least one other row (every
    member of a >1 group counts, matching dbt's `unique` semantics)."""
    dup = (
        df.groupBy(*cols)
        .agg(F.count("*").alias("_cnt"))
        .filter(F.col("_cnt") > 1)
        .agg(F.coalesce(F.sum("_cnt"), F.lit(0)).alias("n_violations"))
    )
    return dup.select(
        F.lit(name).alias("check"),
        F.lit("unique").alias("kind"),
        F.col("n_violations"),
    )


def fk_violations(
    child: DataFrame,
    child_cols: list[str],
    parent: DataFrame,
    parent_cols: list[str],
    name: str,
) -> DataFrame:
    """Child rows with a non-null key absent from the parent (null
    FKs are not violations, per SQL referential semantics)."""
    cond = None
    for c, p in zip(child_cols, parent_cols):
        eq = child[c] == parent[p]
        cond = eq if cond is None else cond & eq
    nn = None
    for c in child_cols:
        x = F.col(c).isNotNull()
        nn = x if nn is None else nn & x
    orphans = (
        child.filter(nn)
        .join(parent.select(*parent_cols), cond, "left_anti")
        .agg(F.count("*").alias("n_violations"))
    )
    return orphans.select(
        F.lit(name).alias("check"),
        F.lit("foreign_key").alias("kind"),
        F.col("n_violations"),
    )


def constraint_report(parts: list[DataFrame]) -> DataFrame:
    """Union the per-check frames and add the ok flag."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "check",
        "kind",
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("ok"),
    )
