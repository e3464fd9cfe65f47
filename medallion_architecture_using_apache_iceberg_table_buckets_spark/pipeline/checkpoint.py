"""JSON checkpoint documents for batch-incremental pipelines.

Reference parity: the file-timestamp checkpoint
(scripts/raw-bronze.py:36-53,87-99 — `{'last_processed_time': ts}`)
and the snapshot-id checkpoint
(scripts/bronze-silver.py:78-112 — `{'last_processed_snapshot': id}`),
both committed only *after* a successful write (at-least-once with an
idempotent sink — SURVEY.md §2.9 T2).

The reference stores these on S3 via boto3; offline we store them on
the local filesystem with an atomic replace. Structured Streaming's
checkpoint dir is the preferred mechanism for the streaming ingest
variant (streaming/); this class exists for batch-mode parity.
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path
from typing import Any


class JsonCheckpoint:
    def __init__(self, path: str | Path):
        self.path = Path(path)

    def load(self) -> dict[str, Any] | None:
        if not self.path.exists():
            return None
        return json.loads(self.path.read_text())

    def commit(self, state: dict[str, Any]) -> None:
        """Atomic write — call only after the downstream write succeeded."""
        self.path.parent.mkdir(parents=True, exist_ok=True)
        tmp = self.path.with_suffix(f".{uuid.uuid4().hex}.tmp")
        tmp.write_text(json.dumps(state, indent=0))
        os.replace(tmp, self.path)
