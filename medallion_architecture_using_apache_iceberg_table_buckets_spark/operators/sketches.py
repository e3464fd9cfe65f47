"""Approximate-sketch operators: mergeable distinct counts and
quantiles at 100 TB scale.

Exact COUNT(DISTINCT) over a high-cardinality key shuffles every
distinct value; the sketch path shrinks that to fixed-size registers
per group and — the part that matters operationally — the sketches
are MERGEABLE: store one HLL per partition/day in a rollup table and
answer any coarser distinct-count query by unioning sketches, never
re-scanning the fact table. Union is order-independent; its estimate
can differ slightly from a single direct sketch (the Datasketches
union gadget may hold registers in a different mode), but stays
inside the same error bounds — both properties asserted in
tests/test_sketches.py against exact counts.

No DuckDB oracle twin: estimates are engine-specific by nature, so
this family is pytest-verified (error-bound + merge-identity) rather
than contract-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_rollup(
    df: DataFrame,
    entity_col: str,
    by: list[str],
    rsd: float = 0.02,
) -> DataFrame:
    """Per-group approximate distinct entities (HLL++, relative
    standard deviation ``rsd``). One map-side-combined aggregation;
    shuffle payload is one sketch per (partition, group), independent
    of entity cardinality."""
    return df.groupBy(*by).agg(
        F.approx_count_distinct(entity_col, rsd).alias("approx_distinct")
    )


def hll_rollup(
    df: DataFrame,
    entity_col: str,
    fine_keys: list[str],
    lg_k: int = 12,
) -> DataFrame:
    """Materialize a fine-grained sketch table: one Datasketches HLL
    per ``fine_keys`` group. This is the stored rollup a pipeline
    writes once per ingest batch."""
    return df.groupBy(*fine_keys).agg(
        F.hll_sketch_agg(F.col(entity_col).cast("string"), F.lit(lg_k)).alias("hll")
    )


def hll_merge(
    sketches: DataFrame,
    coarse_keys: list[str],
    hll_col: str = "hll",
) -> DataFrame:
    """Answer a coarser distinct-count query from stored sketches:
    union the registers, never touching the fact table. ``coarse_keys``
    must be a subset of the sketch table's keys (an empty list gives
    the global count)."""
    agg = F.hll_sketch_estimate(F.hll_union_agg(F.col(hll_col))).alias("approx_distinct")
    if coarse_keys:
        return sketches.groupBy(*coarse_keys).agg(agg)
    return sketches.agg(agg)


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    by: list[str],
    probs: list[float] = (0.5, 0.95, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate quantiles (Greenwald-Khanna via
    ``percentile_approx``): bounded-memory, single aggregation — the
    scale substitute for the exact sort-based percentiles in
    ``agg_percentiles`` when the group is too large to sort."""
    return df.groupBy(*by).agg(
        F.percentile_approx(
            value_col, F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
        ).alias("quantiles")
    )
