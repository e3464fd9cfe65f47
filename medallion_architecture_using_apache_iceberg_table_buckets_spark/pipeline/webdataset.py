"""WebDataset tar-shard source/sink (r10).

WebDataset is the de-facto container for multimodal LLM training
corpora: POSIX tar shards whose members group into samples by key —
``{key}.txt``, ``{key}.json``, ``{key}.jpg`` … — streamed shard-
parallel by data loaders. This module gives the engine both
directions on the standard Arrow shapes:

* :func:`write_shards` — rows -> deterministic tar shard blobs, one
  per shard group (``applyInPandas``: the shard IS the unit of
  parallelism, exactly how loaders consume it);
* :func:`read_shard_members` — shard blobs -> one row per tar member
  (``mapInPandas``: each task walks only its own shards; blobs never
  leave the executor);
* :func:`assemble_samples` — members -> one row per sample with the
  ``.txt`` payload and ``.json`` sidecar re-associated (one keyed
  hash-agg).

Everything is stdlib (``tarfile``/``io``/``json``). Tar bytes are
bit-deterministic: USTAR format, mtime/uid/gid pinned to 0, members
emitted in sorted (key, ext) order — so round-trip tests and the
DuckDB oracle can rely on content, not container noise.

Scale notes (100 TB): shard size is bounded by construction
(``samples_per_shard``), so the per-group pandas buffer is bounded
regardless of corpus size; the shard table is a normal DataFrame —
at a million shards the read side is a million-row mapInPandas with
per-task tarfile walks, the same plan shape at any scale. Reference
parity: the reference pipeline ingests CSV only
(scripts/raw-bronze.py:69-101); WebDataset is part of the
LLM-curation extension surface.
"""

from __future__ import annotations

import io
import json
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEMBER_SCHEMA = (
    "shard_id long, key string, ext string, payload binary, size long"
)


def write_shards(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    samples_per_shard: int = 64,
) -> DataFrame:
    """Pack rows into WebDataset tar shards: shard_id = id //
    samples_per_shard; each sample contributes ``{key}.txt`` (the
    utf-8 text) and ``{key}.json`` (sidecar with the id and byte
    length), key = zero-padded id. Returns (shard_id, content,
    n_samples) — one bounded tar blob per shard group."""
    per = int(samples_per_shard)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id")
        buf = io.BytesIO()
        with tarfile.open(
            fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
        ) as tar:
            for _id, txt in zip(pdf["_id"], pdf["_txt"]):
                key = f"{int(_id):09d}"
                payload = ("" if txt is None else str(txt)).encode("utf-8")
                sidecar = json.dumps(
                    {"doc_id": int(_id), "n_bytes": len(payload)},
                    sort_keys=True,
                ).encode("utf-8")
                for ext, body in (("json", sidecar), ("txt", payload)):
                    info = tarfile.TarInfo(name=f"{key}.{ext}")
                    info.size = len(body)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tar.addfile(info, io.BytesIO(body))
        return pd.DataFrame(
            {
                "shard_id": pd.Series(
                    [int(pdf["_shard"].iloc[0])], dtype="int64"
                ),
                "content": [buf.getvalue()],
                "n_samples": pd.Series([len(pdf)], dtype="int64"),
            }
        )

    keyed = df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(text_col).alias("_txt"),
        (F.col(id_col).cast("long") / per).cast("long").alias("_shard"),
    )
    return keyed.groupBy("_shard").applyInPandas(
        build, schema="shard_id long, content binary, n_samples long"
    )


def read_shard_members(shards: DataFrame) -> DataFrame:
    """Unpack tar shard blobs into one row per member: (shard_id,
    key, ext, payload, size). Real tarfile walk per blob on the
    Arrow mapInPandas shape; a malformed tar raises (never yields a
    short shard silently)."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sids, keys, exts, payloads, sizes = [], [], [], [], []
            for sid, blob in zip(pdf["shard_id"], pdf["content"]):
                with tarfile.open(
                    fileobj=io.BytesIO(bytes(blob)), mode="r:"
                ) as tar:
                    for info in tar:
                        if not info.isfile():
                            continue
                        name = info.name
                        key, dot, ext = name.rpartition(".")
                        body = tar.extractfile(info).read()
                        if len(body) != info.size:
                            raise ValueError(
                                f"truncated member {name!r} in shard {sid}"
                            )
                        sids.append(int(sid))
                        keys.append(key if dot else name)
                        exts.append(ext if dot else "")
                        payloads.append(body)
                        sizes.append(len(body))
            yield pd.DataFrame(
                {
                    "shard_id": pd.Series(sids, dtype="int64"),
                    "key": keys,
                    "ext": exts,
                    "payload": payloads,
                    "size": pd.Series(sizes, dtype="int64"),
                }
            )

    return shards.mapInPandas(walk, schema=MEMBER_SCHEMA)


def assemble_samples(members: DataFrame) -> DataFrame:
    """Re-associate members into samples by (shard_id, key): one
    keyed hash-agg pivoting the ``.txt`` payload and ``.json``
    sidecar side by side (WebDataset's grouping rule). Returns
    (shard_id, key, text, meta_json, n_members); samples missing
    either member surface as NULL columns rather than dropped rows."""
    return (
        members.groupBy("shard_id", "key")
        .agg(
            F.max(
                F.when(
                    F.col("ext") == "txt", F.decode("payload", "utf-8")
                )
            ).alias("text"),
            F.max(
                F.when(
                    F.col("ext") == "json", F.decode("payload", "utf-8")
                )
            ).alias("meta_json"),
            F.count("*").cast("long").alias("n_members"),
        )
    )
