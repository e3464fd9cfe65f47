"""Local mirror of the driver's DuckDB-oracle correctness check.

Runs every ``__spark_entry__.queries()`` entry and its
``oracle_sql()`` twin on the same parquet tables, then compares
row count, column names, and an order-insensitive value comparison.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
Default sf_dir: /root/testdata/sf0.001 (fast); the driver uses sf0.01.

Truncation-proofing: every per-query result line is appended directly
to the log file named by ``$MIRROR_LOG`` (default ``MIRROR.log`` in
the repo root) with an fsync per line, so a clipped stdout capture can
never damage the evidence. The summary line states both the match
count and the number of names listed in the file itself, making the
artifact self-consistent ("140/140 match: 140 names listed").
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
import medallion_architecture_using_apache_iceberg_table_buckets_spark as mats

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # full precision: the driver hashes exact values, so must we
        return f"{v:.17g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = ["|".join(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    # MIRROR.log is the FULL-registry artifact; a subset run (or a
    # mistyped invocation) must never truncate it — those default to
    # a side log unless MIRROR_LOG points elsewhere explicitly
    default_name = "MIRROR.log" if not only else "MIRROR.subset.log"
    log_path = os.environ.get(
        "MIRROR_LOG",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), default_name),
    )
    log_fh = open(log_path, "w")

    def emit(line):
        """Print AND append to the log file, fsynced per line, so a
        head-truncated stdout capture can't damage the artifact."""
        print(line)
        log_fh.write(line + "\n")
        log_fh.flush()
        os.fsync(log_fh.fileno())
    spark = mats.get_spark(app_name="check-oracles", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name would otherwise select nothing and print a
        # vacuous "all 0 queries match" — fail loudly instead
        print(f"ERROR: unknown query name(s): {sorted(unknown)}",
              file=sys.stderr)
        sys.exit(2)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            emit(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            emit(f"weak  {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            emit(f"FAIL  {name}: oracle error: {e}")
            failures.append(name)
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(ocols)}")
        if not problems:
            sc, oc = canon(srows, scols), canon(orows, ocols)
            if sc != oc:
                diffs = [
                    (a, b) for a, b in zip(sc, oc) if a != b
                ][:3]
                problems.append(f"values differ; first diffs: {diffs}")
        if problems:
            emit(f"FAIL  {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            emit(f"match {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
    emit("")
    total = len([n for n in qs if not only or n in only])
    log_fh.flush()
    with open(log_path) as fh:
        listed = sum(
            1 for ln in fh
            if ln.startswith(("match ", "FAIL  ", "weak  "))
        )
    if failures:
        emit(f"{len(failures)} FAILURES: {failures}")
        emit(f"{total - len(failures)}/{total} match: {listed} names listed")
        log_fh.close()
        sys.exit(1)
    emit(f"all {total} queries match")
    emit(f"{total}/{total} match: {listed} names listed")
    log_fh.close()


if __name__ == "__main__":
    main()
