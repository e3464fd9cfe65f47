"""Oracle output-type sweep: the regression gate for the bug class
that cost round 3 its three red rows.

DuckDB's integer `sum()` (and anything derived from it with // or %)
returns HUGEINT (int128); DuckDB's unrounded decimal arithmetic
returns DECIMAL. Spark emits BIGINT / DOUBLE for the matching
expressions, and the driver's value hash serializes the types
differently even when every value agrees — rows+schema green, hash
red. The only reliable detector is the ARROW schema of the oracle's
result (the string-compare mirror in tools/check_oracles.py cannot
see it), so every registry oracle is executed here at sf0.001 and
its output columns are asserted int64/float64/etc-clean.

Pure DuckDB — no Spark session needed; the whole sweep runs in
seconds and fails naming the offending query and column.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

BANNED_TYPE_FRAGMENTS = ("int128", "decimal")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_no_oracle_emits_hugeint_or_decimal(con):
    offenders = []
    for name, sql in entry.oracle_sql().items():
        tbl = con.execute(sql).arrow()
        for f in tbl.schema:
            ts = str(f.type)
            if any(b in ts for b in BANNED_TYPE_FRAGMENTS):
                offenders.append((name, f.name, ts))
    assert not offenders, (
        "oracle columns whose DuckDB type cannot hash-match Spark "
        f"(add CAST ... AS BIGINT/DOUBLE): {offenders}"
    )
