"""Deterministic sampling operators for training-data pipelines.

Two families, both reproducible run-to-run and engine-to-engine
(decisions derive from md5 of the row key, never from an RNG seeded
per-partition — Spark's ``DataFrame.sample`` changes membership when
partitioning changes, which is unacceptable for dataset curation):

- ``sample_hash``        : map-only Bernoulli-by-hash — THE 100 TB
                           path (no shuffle, keep decision is a
                           scan-local predicate)
- ``sample_stratified``  : exact per-stratum quota (ceil(fraction *
                           stratum size)) via one window shuffle —
                           when exact proportions matter more than a
                           map-only plan

DuckDB twin of the hash draw:
``('0x' || substr(md5(key), 1, 15))::BIGINT`` — uniform on
[0, 16^15); keep iff below ``fraction * 16^15``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_SPACE = 16 ** 15  # top 15 hex chars of md5 = 60 bits


def hash_draw(key: F.Column) -> F.Column:
    """Uniform 60-bit draw from a row key (string-cast first)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast("long")


def sample_hash(
    df: DataFrame,
    fraction: float,
    key_col: str,
) -> DataFrame:
    """Deterministic Bernoulli sample: keep iff md5-draw(key) falls in
    the first ``fraction`` of the hash space.

    Map-only (no shuffle, no state); membership is a pure function of
    the key, so re-runs, retries, and repartitions all agree, and a
    later run at a LARGER fraction is a superset of the earlier
    sample (nested samples — the standard curation trick for scaling
    experiments: the 1% set is contained in the 10% set).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    threshold = int(fraction * HASH_SPACE)
    return df.filter(hash_draw(F.col(key_col)) < F.lit(threshold))


def sample_stratified(
    df: DataFrame,
    strata_cols: list[str],
    fraction: float,
    key_col: str,
) -> DataFrame:
    """Exact per-stratum quota sample: the ``ceil(fraction * n)``
    rows of each stratum with the smallest md5 draw (ties broken by
    key — total order, so the result is a deterministic set).

    One shuffle (both windows share the stratum partitioning). Skewed
    strata are fine for counting, but a single stratum larger than an
    executor's window buffer spills; at that point prefer
    ``sample_hash`` (approximately proportional, no shuffle at all).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    w = Window.partitionBy(*strata_cols)
    rn = F.row_number().over(w.orderBy(hash_draw(F.col(key_col)), F.col(key_col)))
    quota = F.ceil(F.count("*").over(w) * F.lit(fraction))
    return (
        df.withColumn("_rn", rn)
        .withColumn("_quota", quota)
        .filter(F.col("_rn") <= F.col("_quota"))
        .drop("_rn", "_quota")
    )


def sample_mixture(
    df: DataFrame,
    rates: dict[str, float],
    domain_col: str,
    key_col: str,
) -> DataFrame:
    """Training-mixture construction: per-domain deterministic
    Bernoulli rates (e.g. upweight-by-keeping-more of high-quality
    sources, downsample boilerplate-heavy ones — the DoReMi /
    Pile-style domain reweighting step, realized as sampling).

    Domains absent from ``rates`` are DROPPED — an explicit mixture
    is an allowlist; silently passing an unlisted domain through is
    how unvetted data leaks into a training set.

    Same scale story as ``sample_hash``: map-only, no shuffle — the
    keep decision is a scan-local predicate on (domain, md5(key)),
    and the per-domain thresholds are precomputed integers compiled
    into a literal map, so membership is a pure function of the row
    (retry/repartition/rerun stable), and samples nest as any
    domain's rate grows.
    """
    for d, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for domain {d!r} must be in [0,1], got {r}")
    thresholds = F.create_map(
        *[
            F.lit(x)
            for d, r in sorted(rates.items())
            for x in (d, int(r * HASH_SPACE))
        ]
    )
    thr = thresholds[F.col(domain_col)]
    # null threshold (unlisted domain) compares to null -> filter drops
    return df.filter(hash_draw(F.col(key_col)) < thr)
