"""Vector math over array<float|double> columns via higher-order
functions (zip_with / aggregate) — executed in the JVM, vectorized by
codegen, no Python round-trip.

Determinism: elements are cast to double before any arithmetic and
summed in array order, so the result is bit-identical across engines
that do the same (the DuckDB oracles cast to DOUBLE[] likewise).
"""

from __future__ import annotations

import pandas  # module-level: pandas_udf type hints resolve via module globals

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; null when either vector has zero norm."""
    ad, bd = to_double_array(a), to_double_array(b)
    denom = l2_norm(ad) * l2_norm(bd)
    return F.when(denom != 0.0, dot(ad, bd) / denom)


def dot_expr(a: str, b: str, dim: int) -> Column:
    """Inline-chain dot product for FIXED-dim array columns (by name).

    Bit-identical to :func:`dot` — same leading 0.0 accumulator and
    left-to-right summation order — but assembled as one SQL string,
    so it whole-stage-codegens. aggregate()/zip_with are
    CodegenFallback: interpreted per row with a zipped-array
    allocation, measured ~8x slower on candidate-verify joins (r3).
    ANSI note: indexes 0..dim-1 must exist (shorter arrays raise);
    callers with unknown dims use the generic :func:`dot`.
    """
    if dim < 1:
        raise ValueError(f"dot_expr needs dim >= 1, got {dim}")
    terms = " + ".join(
        f"CAST(`{a}`[{d}] AS DOUBLE) * CAST(`{b}`[{d}] AS DOUBLE)"
        for d in range(dim)
    )
    return F.expr(f"(0.0D + {terms})")


def l2sq_expr(a: str, b: str, dim: int) -> Column:
    """Inline-chain squared L2 distance for FIXED-dim array columns.

    Bit-identical to the interpreted
    ``aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0.0, +)`` fold —
    same leading 0.0 accumulator, same left-to-right term order, same
    per-element (x-y)*(x-y) double arithmetic — but assembled as one
    SQL chain so it whole-stage-codegens. aggregate()/zip_with are
    CodegenFallback (interpreted per row with a zipped-array
    allocation): above a broadcast hash join scoring n*k candidate
    pairs that interpretation is the stage's hot loop (the same
    measured pathology dot_expr exists for). ANSI note: indexes
    0..dim-1 must exist; callers pass the exact stored sub-dim.
    """
    if dim < 1:
        raise ValueError(f"l2sq_expr needs dim >= 1, got {dim}")
    terms = " + ".join(
        f"(CAST(`{a}`[{d}] AS DOUBLE) - CAST(`{b}`[{d}] AS DOUBLE))"
        f" * (CAST(`{a}`[{d}] AS DOUBLE) - CAST(`{b}`[{d}] AS DOUBLE))"
        for d in range(dim)
    )
    return F.expr(f"(0.0D + {terms})")


def cosine_sim_expr(a: str, b: str, dim: int) -> Column:
    """Fixed-dim inline twin of :func:`cosine_sim` (same null-on-zero
    -norm semantics, bit-identical values).

    CODEGEN SIZE WARNING: this expands to ~3*dim chained terms. Inside
    a join's whole-stage-codegen consume method (where it combines
    with the join's own code) that breaches the JVM's 64 KB
    per-method bytecode limit at dim=64 — Janino fails, Spark retries
    the multi-second compile on EVERY execution, then runs the stage
    interpreted. Joins should precompute :func:`norm_expr` per side
    in an earlier (map) stage and verify with
    :func:`cosine_from_norms`, which carries only the dim-term dot.
    """
    denom = F.sqrt(dot_expr(a, a, dim)) * F.sqrt(dot_expr(b, b, dim))
    return F.when(denom != 0.0, dot_expr(a, b, dim) / denom)


def norm_expr(a: str, dim: int) -> Column:
    """Inline-chain L2 norm of a fixed-dim array column — the same
    sqrt(0.0 + sum a[d]^2) fold :func:`cosine_sim_expr` computes
    inline, exposed so joins can precompute it per side."""
    return F.sqrt(dot_expr(a, a, dim))


def cosine_from_norms(a: str, b: str, norm_a: Column, norm_b: Column, dim: int) -> Column:
    """Cosine similarity from PREcomputed per-side norms.

    Bit-identical to :func:`cosine_sim_expr` — the norm folds are the
    same chains, just evaluated in an earlier stage, and the denom
    keeps the same norm_a * norm_b multiplication order — but the
    join stage itself only carries the dim-term dot, staying under
    the 64 KB codegen method limit (see cosine_sim_expr warning).
    """
    denom = norm_a * norm_b
    return F.when(denom != 0.0, dot_expr(a, b, dim) / denom)


def dot_chain_pandas(
    a: Column | str, b: Column | str, dim: int | None = None
) -> Column:
    """Arrow-vectorized dot product, bit-identical to :func:`dot_expr`.

    Same arithmetic, different engine: each float element widens to
    double (exact), products accumulate STRICTLY left-to-right with
    the chain's leading 0.0 (a zero-prepended row-wise cumsum — numpy
    pairwise/SIMD reductions would reassociate and drift in the last
    ulp, so ``(a*b).sum(axis=1)`` is deliberately NOT used).

    ``dim`` bounds the dot to the first ``dim`` elements, matching the
    expression path (norm_expr/dot_expr only ever read indices
    0..dim-1) — without it an over-long vector would contribute extra
    terms the per-side norms never saw and cosine could exceed 1.
    Null vectors on either side yield null (as the expression chain
    propagates null) instead of an np.stack task failure.

    Why it exists: inside a nested-loop join, Catalyst pushes a
    deterministic cosine filter into the join CONDITION, where the
    dim-term chain runs interpreted on every CROSS pair (no codegen
    in BNLJ) — measured ~20s for 2k vectors at dim 64. A Python UDF
    cannot be evaluated in a join condition, so this expression
    forces the plan into [join on cheap id predicate] -> [Arrow-batch
    dot on surviving pairs]: half the evaluations, BLAS-grade element
    math, identical values. Dense brute-force linear algebra is the
    textbook case for a vectorized pandas UDF over built-ins.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    # NOTE: `from __future__ import annotations` stringifies hints;
    # they resolve through module globals, hence the module-level
    # pandas import above.
    @pandas_udf("double")
    def _dot(xs: pandas.Series, ys: pandas.Series) -> pandas.Series:
        mask = xs.isna().to_numpy() | ys.isna().to_numpy()
        res = np.full(len(xs), np.nan, dtype=np.float64)
        if (~mask).any():
            A = np.stack(xs[~mask].to_numpy()).astype(np.float64)
            B = np.stack(ys[~mask].to_numpy()).astype(np.float64)
            if dim is not None:
                A, B = A[:, :dim], B[:, :dim]
            prod = A * B
            lead = np.zeros((prod.shape[0], 1), dtype=np.float64)
            res[~mask] = np.concatenate([lead, prod], axis=1).cumsum(axis=1)[:, -1]
        out = pandas.Series(res, dtype="Float64")
        return out.mask(mask, None)

    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    # The function IS deterministic; the marker only disables the
    # optimizer moves that hurt here — pushing a filter over the UDF
    # back through the projection (which re-extracts a SECOND
    # ArrowEvalPython node and doubles the Python work) and pushing
    # the expression into a join condition. Values are unaffected.
    return _dot.asNondeterministic()(a, b)


def cosine_from_norms_pandas(
    a: Column | str, b: Column | str, norm_a: Column, norm_b: Column,
    dim: int | None = None,
) -> Column:
    """Twin of :func:`cosine_from_norms` with the dot on the Arrow
    path (same denom order, same null-on-zero-norm semantics; pass
    the same ``dim`` the norms were computed with)."""
    denom = norm_a * norm_b
    return F.when(denom != 0.0, dot_chain_pandas(a, b, dim) / denom)
