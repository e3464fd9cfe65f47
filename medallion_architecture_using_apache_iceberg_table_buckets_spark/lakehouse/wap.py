"""Write-Audit-Publish: the branch-staged quality gate.

The canonical Iceberg pattern for a medallion pipeline (the workflow
the reference's bronze->silver promotion implies but cannot express —
its writes land directly on the table): stage the write on an audit
branch, run validation queries against the staged state, and only
fast-forward main when every audit passes. Readers of main never see
unaudited data; a failed audit costs nothing but the staged files,
which vacuum reclaims once the branch is dropped.

Scale notes: staging is a normal branch commit (metadata pointer, no
data rewrite); audits run on the staged snapshot through the same
pruned scan as any read; publish is a metadata-only fast-forward.
Nothing in the gate is proportional to table size.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from .table import Table

Audit = tuple[str, Callable[[DataFrame], bool]]


@dataclass
class WapResult:
    branch: str
    snapshot_id: int
    published: bool
    passed: list[str] = field(default_factory=list)
    failed: list[str] = field(default_factory=list)


def write_audit_publish(
    spark: SparkSession,
    table: Table,
    df: DataFrame,
    audits: list[Audit],
    mode: str = "append",
    branch: str | None = None,
    keep_branch_on_failure: bool = True,
) -> WapResult:
    """Stage ``df`` on an audit branch, audit, publish on success.

    Each audit is ``(name, check)`` where ``check`` receives the FULL
    staged table state (base + new data) and returns truthiness. On
    any failure main is untouched and the branch is kept (default)
    for debugging — drop it to let vacuum reclaim the staged files.
    On success main fast-forwards to the staged snapshot and the
    audit branch is dropped.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    name = branch or f"audit-{uuid.uuid4().hex[:8]}"
    table.create_branch(name)
    try:
        snap = getattr(table, mode)(df, branch=name)
    except Exception:
        table.drop_ref(name)
        raise
    staged = table.read(spark, ref=name)
    passed, failed = [], []
    for audit_name, check in audits:
        (passed if check(staged) else failed).append(audit_name)
    if failed:
        if not keep_branch_on_failure:
            table.drop_ref(name)
        return WapResult(
            branch=name, snapshot_id=snap.snapshot_id,
            published=False, passed=passed, failed=failed,
        )
    table.fast_forward(name)
    table.drop_ref(name)
    return WapResult(
        branch=name, snapshot_id=snap.snapshot_id,
        published=True, passed=passed, failed=failed,
    )
