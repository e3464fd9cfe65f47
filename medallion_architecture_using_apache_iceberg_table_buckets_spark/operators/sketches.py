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


def theta_segment_sketches(
    df: DataFrame,
    entity_col: str,
    seg_col: str,
    seg_a: str,
    seg_b: str,
    lg_k: int = 12,
) -> DataFrame:
    """One Datasketches Theta sketch per segment, built in a SINGLE
    pass with conditional aggregation (rows outside a segment feed
    NULL, which the sketch ignores). Theta sketches support the full
    set algebra HLL lacks — intersection and difference, not just
    union — which is what corpus-overlap questions (shared users,
    exclusive audiences, contamination across splits) actually need.
    Returns one row ``(ta, tb)`` of binary sketches."""
    e = F.col(entity_col).cast("string")
    return df.agg(
        F.theta_sketch_agg(
            F.when(F.col(seg_col) == seg_a, e), F.lit(lg_k)
        ).alias("ta"),
        F.theta_sketch_agg(
            F.when(F.col(seg_col) == seg_b, e), F.lit(lg_k)
        ).alias("tb"),
    )


def theta_set_estimates(sketches: DataFrame) -> DataFrame:
    """Distinct-count estimates for A∪B, A∩B, A\\B from a 1-row
    ``(ta, tb)`` sketch pair — pure register algebra, the fact table
    is never touched. At 100 TB the sketches are built once per
    ingest batch and every audience-overlap question afterwards is a
    driver-sized computation."""
    return sketches.select(
        F.theta_sketch_estimate(F.theta_union("ta", "tb")).alias("est_union"),
        F.theta_sketch_estimate(F.theta_intersection("ta", "tb")).alias(
            "est_intersection"
        ),
        F.theta_sketch_estimate(F.theta_difference("ta", "tb")).alias(
            "est_difference"
        ),
    )


def kll_rollup(
    df: DataFrame,
    value_col: str,
    fine_keys: list[str],
    k: int = 2048,
) -> DataFrame:
    """Materialize a fine-grained KLL quantile-sketch table (one
    sketch per ``fine_keys`` cell). Unlike the Greenwald-Khanna
    summary behind ``percentile_approx``, KLL sketches are MERGEABLE
    through a public function — the stored rollup can answer coarser
    quantile queries without re-scanning values, the same storage
    contract as ``hll_rollup``."""
    return df.groupBy(*fine_keys).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k)).alias(
            "kll"
        )
    )


def kll_merge(
    sketches: DataFrame,
    coarse_keys: list[str],
    kll_col: str = "kll",
) -> DataFrame:
    """Merge per-cell KLL sketches up to ``coarse_keys`` granularity.
    ``kll_sketch_merge_double`` is a binary scalar function, so the
    per-group merge folds a ``collect_list`` of the cell sketches:
    the cell count per coarse group is bounded by design (days per
    type, files per partition — hundreds, not millions), and each
    sketch is a few KB, so the collected array stays executor-sized
    at any fact-table scale. The fold is associative; a tree
    aggregation would replace it only if a group ever held ~1e5+
    cells."""
    arr = sketches.groupBy(*coarse_keys).agg(
        F.collect_list(kll_col).alias("_ks")
    )
    rest = F.slice(
        "_ks", F.lit(2), F.greatest(F.size("_ks") - 1, F.lit(0))
    )
    merged = F.aggregate(
        rest,
        F.element_at("_ks", 1),
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    ).alias(kll_col)
    return arr.select(*coarse_keys, merged)


def kll_quantiles(
    sketches: DataFrame,
    probs: list[float],
    labels: list[str],
    kll_col: str = "kll",
) -> DataFrame:
    """Read quantile values out of a (possibly merged) KLL sketch
    column — one output column per requested rank."""
    cols = [c for c in sketches.columns if c != kll_col]
    return sketches.select(
        *cols,
        *[
            F.kll_sketch_get_quantile_double(kll_col, F.lit(p)).alias(lab)
            for p, lab in zip(probs, labels)
        ],
    )


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


# ----------------------------------------------------------------------
# Count-Min sketch — relational formulation
# ----------------------------------------------------------------------

def _cms_hash(value: F.Column, row_col: F.Column, width: int) -> F.Column:
    """Sketch-row bucket for ``value``: 60-bit md5 draw of
    "row:value" mod width. Deterministic and engine-portable (the
    sampling.hash_draw idiom), so a DuckDB oracle reproduces the
    whole sketch bit-for-bit — unlike the Datasketches HLL/KLL/Theta
    family above, CMS cells are plain counts and the estimate is
    exactly recomputable."""
    key = F.concat_ws(":", row_col.cast("string"), value.cast("string"))
    return (
        F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
        % F.lit(width)
    )


def cms_rollup(
    df: DataFrame,
    value_col: str,
    fine_keys: list[str],
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Materialize a Count-Min sketch per ``fine_keys`` group as a
    CELL TABLE ``(fine_keys..., cms_row, cms_col, cms_count)`` — the
    stored frequency rollup a pipeline writes per ingest batch.

    Scale shape: one explode to ``depth`` rows (map-only) + one
    key-local count shuffle; the result is at most
    ``groups * depth * width`` rows however large the fact table.
    Cells are additive, so sketches MERGE by unioning cell tables and
    re-summing (``cms_merge``) — the same rollup-then-merge contract
    as hll_rollup/hll_merge, with CMS's one-sided overcount error
    (est >= true; est <= true + eps*N w.p. 1 - (1/2)^depth,
    eps ~ e/width).
    """
    rows = F.explode(
        F.array(*[F.lit(i) for i in range(depth)])
    ).alias("cms_row")
    v = F.col(value_col)
    e = df.select(*fine_keys, v.alias("_v"), rows).withColumn(
        "cms_col", _cms_hash(F.col("_v"), F.col("cms_row"), width)
    )
    return (
        e.groupBy(*fine_keys, "cms_row", "cms_col")
        .agg(F.count("*").alias("cms_count"))
    )


def cms_merge(
    cells: DataFrame,
    coarse_keys: list[str],
) -> DataFrame:
    """Merge stored sketches to a coarser key (empty list = global):
    cells are additive counters, so merge is a re-sum — never touches
    the fact table."""
    keys = coarse_keys + ["cms_row", "cms_col"]
    return cells.groupBy(*keys).agg(
        F.sum("cms_count").alias("cms_count")
    )


def cms_point_estimates(
    cells: DataFrame,
    queries: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Estimate each query value's frequency from a (global) cell
    table: hash the value per sketch row, join the matching cells,
    take the MIN over rows (absent cells read 0). Returns
    ``(value_col, cms_estimate)``. The probe is an equi-join on
    (cms_row, cms_col) — broadcastable query set, no scan of the
    original data."""
    rows = F.explode(
        F.array(*[F.lit(i) for i in range(depth)])
    ).alias("cms_row")
    probes = queries.select(F.col(value_col), rows).withColumn(
        "cms_col", _cms_hash(F.col(value_col), F.col("cms_row"), width)
    )
    return (
        probes.join(cells, ["cms_row", "cms_col"], "left")
        .groupBy(value_col)
        .agg(
            F.min(F.coalesce(F.col("cms_count"), F.lit(0)))
            .cast("long")
            .alias("cms_estimate")
        )
    )
