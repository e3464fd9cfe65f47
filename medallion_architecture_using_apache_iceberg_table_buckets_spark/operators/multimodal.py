"""Multimodal columns: opaque binary media + typed metadata.

Design for image/audio/video at 100 TB:

- media is an opaque ``binary`` column plus a typed metadata struct
  (``media_type``, ``byte_len``, ``sha256``) — rows stay columnar,
  Parquet stores the blobs page-compressed, and metadata predicates
  (type/size filters) prune without touching the bytes;
- decode / feature-extract / resize / frame-sample run as
  Arrow-batched functions over ``mapInPandas`` — one Python worker
  per partition, whole batches in Arrow, never a row-at-a-time UDF;
- partitioning: blobs are heavy, so upstream repartition targets
  bytes-per-partition, not rows (``target_partitions`` helper).

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
``decode_image`` raises ``NotImplementedError`` by design; the
deterministic stub ``fake_decode_meta`` exercises the full Spark
plumbing (schema, Arrow batches, partitioning) and is what the tests
drive.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id long, media_type string, byte_len int, sha256 string, "
    "fake_width int, fake_height int"
)


def attach_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a media table from text bytes (the offline stand-in for
    real image/audio ingestion): binary content + typed metadata."""
    content = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        content.alias("content"),
        F.lit("text/plain").alias("media_type"),
        F.octet_length(F.col(text_col)).alias("byte_len"),
        F.sha2(content, 256).alias("sha256"),
    )


def decode_image(content: bytes) -> "object":
    """Real image decode — requires PIL/opencv, absent from this
    container. STUB by design; the Spark-side plumbing around it
    (Arrow batching, schema, partitioning) is real and tested via
    fake_decode_meta."""
    raise NotImplementedError(
        "image decoding requires an image codec library (e.g. PIL), "
        "not available in this environment; use fake_decode_meta for "
        "pipeline plumbing"
    )


def fake_decode_meta(df: DataFrame) -> DataFrame:
    """Deterministic 'decode': derive pseudo width/height from the
    content bytes via mapInPandas (Arrow-batched, partition-parallel).

    This is the exact execution shape a real decoder uses — swap the
    body for PIL/ffmpeg calls and the plan is unchanged.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lens = pdf["content"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": lens.astype("int32"),
                    "sha256": pdf["sha256"],
                    "fake_width": (lens % 640 + 1).astype("int32"),
                    "fake_height": (lens % 480 + 1).astype("int32"),
                }
            )

    return df.mapInPandas(decode_batches, schema=MEDIA_META_SCHEMA)


def target_partitions(df: DataFrame, total_bytes: int, bytes_per_partition: int = 128 << 20) -> DataFrame:
    """Repartition a blob table by payload size, not row count."""
    n = max(1, total_bytes // bytes_per_partition)
    return df.repartition(int(n))


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_ts_ms long, byte_offset long"


def frame_sample(df: DataFrame, max_frames: int = 8) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled
    frame (1-to-N mapInPandas — the shape ffmpeg keyframe extraction
    uses). Frame *positions* are deterministic arithmetic on the blob
    (n = min(max_frames, byte_len // 200 + 1), evenly spaced byte
    offsets, 1 s apart), so the plumbing is exactly oracle-checkable;
    a real build swaps the arithmetic for container parsing and the
    plan is unchanged."""

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, offs = [], [], [], []
            for doc_id, blen in zip(pdf["doc_id"], pdf["byte_len"]):
                n = min(max_frames, int(blen) // 200 + 1)
                for i in range(n):
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(i * 1000)
                    offs.append(i * int(blen) // n)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "byte_offset": pd.Series(offs, dtype="int64"),
                }
            )

    return df.mapInPandas(sample_batches, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, src_width int, src_height int, dst_width int, dst_height int"
)


def resize_meta(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Aspect-preserving resize geometry over the fake-decoded
    dimensions (vectorized pandas arithmetic in mapInPandas; the real
    pixel resample is the codec stub — geometry is the verifiable
    Spark-side part)."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["fake_width"].astype("int64")
            h = pdf["fake_height"].astype("int64")
            side = w.combine(h, max)
            scaled = side > max_side
            dw = w.where(~scaled, (w * max_side) // side)
            dh = h.where(~scaled, (h * max_side) // side)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "src_width": w.astype("int32"),
                    "src_height": h.astype("int32"),
                    "dst_width": dw.astype("int32"),
                    "dst_height": dh.astype("int32"),
                }
            )

    return df.mapInPandas(resize_batches, schema=RESIZE_SCHEMA)


EMBED_DIM = 8
EMBED_SCHEMA = f"doc_id long, embedding array<double>"


def fake_feature_extract(df: DataFrame, dim: int = EMBED_DIM) -> DataFrame:
    """Feature-extraction plumbing: content -> fixed-dim vector via
    mapInPandas (the signature a vision/audio encoder batch-inference
    UDF has). Features are deterministic slices of the sha256 hex
    (4 hex chars per dimension, scaled to [0, 1]) so the DuckDB
    oracle reproduces them exactly; a real build swaps in model
    inference over the Arrow batch."""

    def embed_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = [
                [int(h[4 * j : 4 * j + 4], 16) / 65535.0 for j in range(dim)]
                for h in pdf["sha256"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "embedding": vecs})

    return df.mapInPandas(embed_batches, schema=EMBED_SCHEMA)
