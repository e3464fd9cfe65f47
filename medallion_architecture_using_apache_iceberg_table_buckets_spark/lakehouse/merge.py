"""MERGE INTO — file-scoped copy-on-write upsert.

Engine equivalent of the reference's
``MERGE INTO target USING source ON target.invoiceid =
source.invoiceid WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN
INSERT *`` (template scripts/bronze-silver.py:254-269, executed
:213), the only join in the reference (SURVEY.md §2.3 J1). Also
supports CDC deletes (``Op='D'`` — implied by the DMS convention the
fixtures use, FIXTURES.md §1).

Execution strategy (what Iceberg's COW RowLevelCommand does, built
from DataFrame ops so Catalyst owns the physical plan):

1. *Touched-file discovery*: semi-join target(key, _file) against the
   distinct source keys; only data files that actually contain a
   matched key are rewritten. The scan is column-pruned to the key,
   and at 100 TB this is the difference between rewriting a handful
   of files and rewriting the table.
2. *Rewrite*: rows of touched files anti-joined against source keys
   (drop matched rows) unioned with the source's upsert rows
   (update + insert in one pass). Untouched files are carried over in
   the manifest unchanged.
3. AQE broadcasts the deduped source side when small (the common CDC
   case: a micro-batch of changed keys vs a huge target).

The caller is responsible for source dedup (one row per key) — the
pipeline layer does keep-latest-per-key first (W1), matching the
reference's dedup-then-merge order (scripts/bronze-silver.py:258-266).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .table import Snapshot, Table

# Upper bound on distinct partition-key values collected for discovery
# pruning; beyond this the merge falls back to an unpruned discovery
# scan (correct, just less surgical).
PRUNE_MAX_VALUES = 1024


def _project_to(df: DataFrame, table: Table) -> DataFrame:
    """Project source columns onto the target schema (MERGE binds by name).

    Mirrors the reference behavior where the silver schema excludes
    bronze-only columns (`Op`, `input_file`, ...) — the merge writes
    only the declared columns (SURVEY.md §7.4).
    """
    schema = table.schema
    return df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def merge_into(
    spark: SparkSession,
    table: Table,
    source: DataFrame,
    on: str | list[str],
    delete_predicate: str | None = None,
    broadcast_source: bool = True,
) -> Snapshot:
    """Upsert `source` into `table` on key columns `on`.

    WHEN MATCHED UPDATE SET * / WHEN NOT MATCHED INSERT * semantics;
    rows satisfying `delete_predicate` (evaluated against the raw
    source, e.g. ``"Op = 'D'"``) instead delete their matched target
    rows and are not inserted.

    ``broadcast_source`` (default True) hints the deduped source key
    set for the touched-file discovery and rewrite joins — the right
    call for CDC micro-batches (small source vs huge target) and it
    avoids a probing job. Pass False for bulk merges where the source
    rivals the target; AQE then picks the strategy from runtime stats.
    """
    keys = [on] if isinstance(on, str) else list(on)

    if delete_predicate is not None:
        deletes = source.filter(F.expr(delete_predicate))
        upserts = source.filter(~F.expr(delete_predicate))
    else:
        deletes = None
        upserts = source

    # merge-on-read path: append delta files, defer resolution to read
    # time (the Iceberg write.merge.mode table property — the
    # reference sets it at scripts/bronze-silver.py:179-194)
    if table.properties.get("write.merge.mode") == "merge-on-read":
        delta = _project_to(upserts, table).withColumn("_op", F.lit("u"))
        if deletes is not None:
            delta = delta.unionByName(
                _project_to(deletes, table).withColumn("_op", F.lit("d"))
            )
        return table.append_merge_delta(delta, keys)

    upsert_rows = _project_to(upserts, table)
    all_keys = upserts.select(*keys)
    if deletes is not None:
        all_keys = all_keys.unionByName(deletes.select(*keys))
    all_keys = all_keys.distinct()

    snap = table.current_snapshot()
    if not snap.files:
        # Empty target: MERGE degenerates to INSERT *.
        return table.replace_files([], upsert_rows, operation="merge")

    if broadcast_source:
        all_keys = F.broadcast(all_keys)

    # 0. partition pruning for the discovery scan: when a partition
    # transform is a function of the merge keys alone (identity or
    # bucket(N, key)), every matched target row must live in a
    # partition derived from some source key — so discovery only
    # scans those directories. Key-independent transforms (e.g.
    # days(event_ts)) are never pruned: an update may move the row
    # across those partitions.
    from .transforms import parse_spec, partition_segment

    candidate_files = list(snap.files)
    prunable = [t for t in parse_spec(table.partition_by) if t.col in keys]
    if prunable:
        # The distinct partition values come to the driver; cap the
        # haul so an unbounded-cardinality key (e.g. identity
        # partition on the merge key itself) degrades to no pruning
        # instead of collecting millions of rows.
        vals = (
            all_keys.select(
                *[
                    t.expr(all_keys.schema[t.col].dataType).alias(t.partition_col)
                    for t in prunable
                ]
            )
            .distinct()
            .limit(PRUNE_MAX_VALUES + 1)
            .collect()
        )
        if len(vals) > PRUNE_MAX_VALUES:
            vals = []
        # On-disk segments are escapePathName()-encoded by the
        # partitioned writer; partition_segment reproduces that
        # encoding and returns None for values whose written form is
        # not reproducible (null/empty -> default partition, floats,
        # sub-second timestamps) — any None disables pruning rather
        # than risk dropping the file that holds a matched row.
        allowed: dict[str, set[str]] = {}
        for t in prunable if vals else ():
            segs = {
                partition_segment(t.partition_col, row[t.partition_col])
                for row in vals
            }
            if None in segs:
                allowed = {}
                break
            allowed[t.partition_col] = segs
        if allowed:
            candidate_files = [
                f
                for f in candidate_files
                if all(
                    any(seg in f.split("/") for seg in segs)
                    for segs in allowed.values()
                )
            ]

    # 1. touched-file discovery (column-pruned scan of key + file path)
    target = table._read_files(spark, candidate_files, table.schema)
    touched = (
        target.withColumn("_file", F.input_file_name())
        .select("_file", *keys)
        .join(all_keys, keys, "left_semi")
        .select("_file")
        .distinct()
        .collect()
    )
    data_root = str(table.data_root)
    touched_rel = sorted({_to_rel(r["_file"], data_root) for r in touched})

    if not touched_rel:
        # Pure insert: no file rewrite at all, just new files.
        return table.replace_files([], upsert_rows, operation="merge")

    # 2. rewrite only touched files (live view: any position deletes
    # on them are applied, else the COW rewrite would resurrect rows)
    touched_df = table._read_live(spark, touched_rel, table.schema)
    kept = touched_df.join(all_keys, keys, "left_anti")
    rewritten = kept.unionByName(upsert_rows)
    return table.replace_files(touched_rel, rewritten, operation="merge")


def _to_rel(uri: str, data_root: str) -> str:
    """input_file_name() yields a percent-encoded URI; decode it so
    the stored relative path is the literal on-disk name (partition
    dirs legitimately contain '%' from escapePathName, which arrives
    double-encoded as %25)."""
    from urllib.parse import unquote

    p = uri
    if p.startswith("file:"):
        p = unquote(p[len("file:") :])
        while p.startswith("//"):
            p = p[1:]
    return str(Path(p).relative_to(data_root))
