"""Hidden partition transforms — Iceberg-style ``bucket(N, col)`` and
``days(col)`` alongside identity partitioning.

SURVEY.md §4 flags these as the idiomatic upgrade over the
reference's string-date identity partitions: the partition value is
derived at write time into a hidden ``_p_*`` directory column and
never stored in the data or surfaced on read.

Scale payoff: ``bucket(N, key)`` on a MERGE key lets the merge prune
its touched-file discovery to the source keys' bucket directories —
the discovery scan reads |affected buckets|/N of the table instead of
all of it (lakehouse/merge.py). ``days(ts)`` gives time-pruned scans
without a user-visible string column.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_BUCKET_RE = re.compile(r"^bucket\(\s*(\d+)\s*,\s*(\w+)\s*\)$")
_DAYS_RE = re.compile(r"^days\(\s*(\w+)\s*\)$")


class Transform:
    def __init__(self, spec: str):
        self.spec = spec
        m = _BUCKET_RE.match(spec)
        if m:
            self.kind = "bucket"
            self.n = int(m.group(1))
            self.col = m.group(2)
            self.partition_col = f"_p_{self.col}_bucket"
            return
        m = _DAYS_RE.match(spec)
        if m:
            self.kind = "days"
            self.col = m.group(1)
            self.partition_col = f"_p_{self.col}_day"
            return
        self.kind = "identity"
        self.col = spec
        self.partition_col = spec

    @property
    def hidden(self) -> bool:
        return self.kind != "identity"

    def expr(self) -> Column:
        if self.kind == "bucket":
            # pmod(xxhash64) spreads skew and is stable across writers
            return F.pmod(F.xxhash64(F.col(self.col)), F.lit(self.n)).cast("int")
        if self.kind == "days":
            return F.date_format(F.col(self.col), "yyyy-MM-dd")
        return F.col(self.col)


def parse_spec(partition_by: list[str]) -> list[Transform]:
    return [Transform(s) for s in partition_by]
