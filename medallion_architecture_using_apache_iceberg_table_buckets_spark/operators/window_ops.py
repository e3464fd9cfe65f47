"""Window-based operators: keep-latest-per-key and as-of join.

``keep_latest_per_key`` is the engine-wide form of the reference's
dedup (W1 — scripts/bronze-silver.py:258-266). ``asof_join`` is an
operator the reference lacks (SURVEY.md §2.3 "not present"), built as
a composition of existing DataFrame ops — the union + ordered-window
forward-fill idiom — rather than a UDF, so it scales as one shuffle
on the join key and never materializes a cross product.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def keep_latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    descending: bool = True,
) -> DataFrame:
    """One row per key, latest by `order_by` (deterministic given a
    total order — include a unique column as the final tie-break)."""
    ordering = [F.desc(c) if descending else F.asc(c) for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    right_order: Sequence[str] = (),
    inclusive: bool = True,
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row of
    the same key with ``right_ts <= left_ts`` (or ``<`` when
    ``inclusive=False``).

    Execution: union both sides tagged, one window per key ordered by
    (event time, side, right_order), forward-fill the right payload,
    keep left rows. One shuffle on `on`; no range/cross join. At 100
    TB this is the only as-of strategy that avoids a quadratic
    candidate set; ties on the right side are broken by
    ``right_order`` (last wins).

    Returns the full left row plus ``right_payload`` columns (null
    when no earlier right row exists).
    """
    on = list(on)
    right_payload = list(right_payload)
    lcols = left.columns
    # side marker: right rows sort before left rows at equal ts when
    # inclusive (so same-instant right rows are visible to the left row)
    rside, lside = (0, 1) if inclusive else (1, 0)

    rsel = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(rside).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_payload],
        *[
            F.col(c).alias(f"_o_{i}")
            for i, c in enumerate(right_order)
        ],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    lsel = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(lside).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_payload],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_o_{i}")
            for i, c in enumerate(right_order)
        ],
        *lcols,
    )
    # keep key columns once: left's own key cols are also in lcols —
    # rename the leading join copies
    rsel = rsel.toDF(*[f"_k_{c}" for c in on], *rsel.columns[len(on):])
    lsel = lsel.toDF(*[f"_k_{c}" for c in on], *lsel.columns[len(on):])

    unioned = rsel.unionByName(lsel)
    order_cols = [F.col("_ts").asc(), F.col("_side").asc()] + [
        F.col(f"_o_{i}").asc() for i in range(len(right_order))
    ]
    w = (
        Window.partitionBy(*[f"_k_{c}" for c in on])
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in right_payload
        ],
    )
    out = filled.filter(F.col("_side") == lside).select(
        *lcols, *[F.col(f"_f_{c}").alias(c) for c in right_payload]
    )
    return out

