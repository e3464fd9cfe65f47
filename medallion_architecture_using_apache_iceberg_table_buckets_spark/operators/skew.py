"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (on in session.py) handles most cases at
runtime; these utilities cover the two shapes AQE cannot fix:

- ``salted_agg``: a two-phase aggregation for skewed GROUP BY keys.
  Phase 1 groups on (key, salt) — the hot key's rows spread over
  `salt_buckets` reducers; phase 2 combines the partials. Only works
  for algebraic aggregates (sum/count/min/max), which is exactly what
  it exposes.
- ``salted_join``: replicate the small side `salt_buckets` times and
  salt the big side uniformly, so one hot join key no longer lands on
  a single reducer. For small dims prefer broadcast; salting is for
  the mid-size dim that does not fit in memory.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max}. Results are identical to a direct
    groupBy; only the shuffle distribution changes.
    """
    phase1_aggs, phase2_aggs = [], []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            phase1_aggs.append(F.count(col).alias(f"_p_{out}"))
            phase2_aggs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "sum":
            phase1_aggs.append(F.sum(col).alias(f"_p_{out}"))
            phase2_aggs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "min":
            phase1_aggs.append(F.min(col).alias(f"_p_{out}"))
            phase2_aggs.append(F.min(f"_p_{out}").alias(out))
        elif fn == "max":
            phase1_aggs.append(F.max(col).alias(f"_p_{out}"))
            phase2_aggs.append(F.max(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate: {fn}")
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "_salt").agg(*phase1_aggs)
    return partial.groupBy(*keys).agg(*phase2_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    Output equals ``big.join(small, on, how)`` for inner/left joins.
    The small side grows by `salt_buckets`x — keep it the genuinely
    smaller relation.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    on = list(on)
    big_s = big.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = big_s.join(small_s, on + ["_salt"], how)
    return out.drop("_salt")
