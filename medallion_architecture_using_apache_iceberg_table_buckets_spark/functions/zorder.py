"""Z-order (Morton) interleave keys for multi-dimensional data
clustering.

Sorting a rewrite by ``zorder_key([a, b])`` keeps rows that are close
in BOTH dimensions inside the same files, so per-file min/max stats
(manifest skipping + Parquet row groups) prune scans filtered on
either column — where a plain lexicographic sort only serves its
leading column. This is the layout Iceberg's
``rewrite_data_files(strategy => 'sort', sort_order => 'zorder(a,b)')``
produces; here it is a plain integer expression usable anywhere a
sort key is (Table.compact, repartitionByRange, write-time ordering).

The key is deterministic integer bit-math — DuckDB twin built by the
same generator (``zorder_sql``) with ``>>``/``&``/``<<`` operators —
so clustered layouts are reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_TOTAL_BITS = 63  # interleaved key must stay in a signed int64


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of each column into one
    int64 sort key (column i contributes bit positions i, i+n,
    i+2n, ...).

    Inputs are masked to ``bits`` (values must be pre-scaled into
    [0, 2^bits) — e.g. bucket a timestamp to days, rank-bucket a
    float; negative or wider values wrap by masking, which preserves
    determinism but not locality). Pure projection — no shuffle, no
    UDF, whole-stage codegen.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("z-order needs at least 2 columns")
    if n * bits > MAX_TOTAL_BITS:
        raise ValueError(f"{n} cols x {bits} bits exceeds {MAX_TOTAL_BITS}-bit key")
    mask = (1 << bits) - 1
    masked = [
        (F.col(c) if isinstance(c, str) else c).cast("long").bitwiseAND(F.lit(mask))
        for c in cols
    ]
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(masked):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return out


def zorder_sql(cols: list[str], bits: int = 16) -> str:
    """DuckDB/ANSI twin of ``zorder_key`` over the same column names —
    identical bit layout, so both engines produce the same key."""
    n = len(cols)
    if n < 2:
        raise ValueError("z-order needs at least 2 columns")
    if n * bits > MAX_TOTAL_BITS:
        raise ValueError(f"{n} cols x {bits} bits exceeds {MAX_TOTAL_BITS}-bit key")
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        for j, c in enumerate(cols):
            terms.append(
                f"((((CAST({c} AS BIGINT) & {mask}) >> {i}) & 1) << {i * n + j})"
            )
    return "(" + " | ".join(terms) + ")"
