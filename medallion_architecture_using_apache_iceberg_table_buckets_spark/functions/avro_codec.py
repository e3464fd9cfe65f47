"""Pure-Python Avro binary codec + Spark from_avro/to_avro.

The reference imports ``from_avro``/``to_avro``
(scripts/bronze-silver.py:15) from spark-avro, whose jar is absent
from this environment. Rather than leave the data plane untranslated,
this module implements the Avro 1.11 BINARY ENCODING (public spec:
zigzag-varint ints/longs, little-endian IEEE floats, length-prefixed
strings/bytes, union-index prefix following the schema's declared
branch order, block-encoded arrays/maps, logical date = days-int and
timestamp-micros = long) for records of primitives, 2-branch null
unions, nested records, arrays, maps, enums, and fixed — a superset
of what the reference's orders schema needs.

Spark surface:
- ``from_avro(df, binary_col, schema_json)`` -> decoded struct
  columns via Arrow-batched ``mapInPandas`` (one Python worker per
  partition, never row-at-a-time);
- ``to_avro(df, schema_json)`` -> one ``avro`` binary column.

This is deliberately the slow-but-correct path: when a spark-avro
jar is on the classpath, swap these calls for the native functions —
the schema translation (schema.py) and everything downstream is
unchanged. Correctness is pinned by round-trip property tests plus
fixed known-byte vectors from the spec.
"""

from __future__ import annotations

import datetime
import json
import struct
from typing import Any, Iterator

from pyspark.sql import DataFrame

from ..schema import avro_schema_to_spark_schema

_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_TS = datetime.datetime(1970, 1, 1)


# --------------------------------------------------------------------------
# primitive encoders/decoders (Avro 1.11 spec, binary encoding)
# --------------------------------------------------------------------------

def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = z = 0
    while True:
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (z >> 1) ^ -(z & 1), pos


def _norm_type(t: Any) -> Any:
    """Collapse a field type to one of: primitive name,
    ('union', inner, null_branch), ('date',), ('timestamp', logical),
    ('array', items), ('map', values), ('record', fields),
    ('enum', symbols), ('fixed', size)."""
    if isinstance(t, list):
        non_null = [x for x in t if x != "null"]
        if len(t) == 2 and len(non_null) == 1:
            # Branch indices follow the DECLARED order: ["null", X]
            # puts null at 0, ["X", "null"] at 1 — bytes must agree
            # with the schema or a spec-compliant reader misparses.
            return ("union", _norm_type(non_null[0]), t.index("null"))
        raise ValueError(f"unsupported Avro union {t!r} (only 2-branch with null)")
    if isinstance(t, dict):
        logical = t.get("logicalType")
        if logical == "date":
            return ("date",)
        if logical in ("timestamp-micros", "timestamp-millis"):
            return ("timestamp", logical)
        kind = t.get("type")
        if kind == "record":
            return (
                "record",
                [(f["name"], _norm_type(f["type"])) for f in t["fields"]],
            )
        if kind == "array":
            return ("array", _norm_type(t["items"]))
        if kind == "map":
            return ("map", _norm_type(t["values"]))
        if kind == "enum":
            return ("enum", list(t["symbols"]))
        if kind == "fixed":
            return ("fixed", int(t["size"]))
        return _norm_type(kind)
    if t in ("string", "int", "long", "float", "double", "boolean", "bytes"):
        return t
    raise ValueError(f"unsupported Avro type {t!r}")


def _encode_value(t: Any, v: Any) -> bytes:
    if isinstance(t, tuple) and t[0] == "union":
        _, inner, null_branch = t
        if v is None:
            return _zigzag_encode(null_branch)
        return _zigzag_encode(1 - null_branch) + _encode_value(inner, v)
    if v is None:
        raise ValueError("null value for non-nullable Avro field")
    if isinstance(t, tuple) and t[0] == "date":
        return _zigzag_encode((v - _EPOCH_DATE).days)
    if isinstance(t, tuple) and t[0] == "timestamp":
        delta = v - _EPOCH_TS
        micros = (delta.days * 86400 + delta.seconds) * 1_000_000 + delta.microseconds
        if t[1] == "timestamp-millis":
            return _zigzag_encode(micros // 1000)
        return _zigzag_encode(micros)
    if t in ("int", "long"):
        return _zigzag_encode(int(v))
    if t == "boolean":
        return b"\x01" if v else b"\x00"
    if t == "float":
        return struct.pack("<f", v)
    if t == "double":
        return struct.pack("<d", v)
    if t == "string":
        raw = v.encode("utf-8")
        return _zigzag_encode(len(raw)) + raw
    if t == "bytes":
        return _zigzag_encode(len(v)) + bytes(v)
    if isinstance(t, tuple) and t[0] == "array":
        items = list(v)
        if not items:
            return _zigzag_encode(0)
        body = b"".join(_encode_value(t[1], x) for x in items)
        return _zigzag_encode(len(items)) + body + _zigzag_encode(0)
    if isinstance(t, tuple) and t[0] == "map":
        entries = dict(v)
        if not entries:
            return _zigzag_encode(0)
        body = b"".join(
            _encode_value("string", k) + _encode_value(t[1], x)
            for k, x in entries.items()
        )
        return _zigzag_encode(len(entries)) + body + _zigzag_encode(0)
    if isinstance(t, tuple) and t[0] == "record":
        return b"".join(_encode_value(ft, v.get(n)) for n, ft in t[1])
    if isinstance(t, tuple) and t[0] == "enum":
        try:
            return _zigzag_encode(t[1].index(v))
        except ValueError:
            raise ValueError(f"{v!r} is not an enum symbol of {t[1]}") from None
    if isinstance(t, tuple) and t[0] == "fixed":
        raw = bytes(v)
        if len(raw) != t[1]:
            raise ValueError(f"fixed({t[1]}) value has {len(raw)} bytes")
        return raw
    raise ValueError(f"unsupported Avro type {t!r}")


def _decode_value(t: Any, buf: bytes, pos: int) -> tuple[Any, int]:
    if isinstance(t, tuple) and t[0] == "union":
        branch, pos = _zigzag_decode(buf, pos)
        if branch == t[2]:
            return None, pos
        return _decode_value(t[1], buf, pos)
    if isinstance(t, tuple) and t[0] == "date":
        days, pos = _zigzag_decode(buf, pos)
        return _EPOCH_DATE + datetime.timedelta(days=days), pos
    if isinstance(t, tuple) and t[0] == "timestamp":
        n, pos = _zigzag_decode(buf, pos)
        micros = n * 1000 if t[1] == "timestamp-millis" else n
        return _EPOCH_TS + datetime.timedelta(microseconds=micros), pos
    if t in ("int", "long"):
        return _zigzag_decode(buf, pos)
    if t == "boolean":
        return buf[pos] == 1, pos + 1
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == "string":
        ln, pos = _zigzag_decode(buf, pos)
        return buf[pos : pos + ln].decode("utf-8"), pos + ln
    if t == "bytes":
        ln, pos = _zigzag_decode(buf, pos)
        return bytes(buf[pos : pos + ln]), pos + ln
    if isinstance(t, tuple) and t[0] == "array":
        out = []
        while True:
            count, pos = _zigzag_decode(buf, pos)
            if count == 0:
                return out, pos
            if count < 0:  # block with byte-size prefix (spec-legal)
                count = -count
                _, pos = _zigzag_decode(buf, pos)
            for _ in range(count):
                x, pos = _decode_value(t[1], buf, pos)
                out.append(x)
    if isinstance(t, tuple) and t[0] == "map":
        out = {}
        while True:
            count, pos = _zigzag_decode(buf, pos)
            if count == 0:
                return out, pos
            if count < 0:
                count = -count
                _, pos = _zigzag_decode(buf, pos)
            for _ in range(count):
                k, pos = _decode_value("string", buf, pos)
                out[k], pos = _decode_value(t[1], buf, pos)
    if isinstance(t, tuple) and t[0] == "record":
        rec = {}
        for n, ft in t[1]:
            rec[n], pos = _decode_value(ft, buf, pos)
        return rec, pos
    if isinstance(t, tuple) and t[0] == "enum":
        idx, pos = _zigzag_decode(buf, pos)
        return t[1][idx], pos
    if isinstance(t, tuple) and t[0] == "fixed":
        return bytes(buf[pos : pos + t[1]]), pos + t[1]
    raise ValueError(f"unsupported Avro type {t!r}")


def _record_fields(schema_json: str | dict) -> list[tuple[str, Any]]:
    sc = json.loads(schema_json) if isinstance(schema_json, str) else schema_json
    if sc.get("type") != "record":
        raise ValueError("top-level Avro schema must be a record")
    return [(f["name"], _norm_type(f["type"])) for f in sc["fields"]]


def encode_record(schema_json: str | dict, record: dict) -> bytes:
    """One datum, Avro binary encoding (no container framing)."""
    fields = _record_fields(schema_json)
    return b"".join(_encode_value(t, record.get(name)) for name, t in fields)


def decode_record(schema_json: str | dict, buf: bytes) -> dict:
    fields = _record_fields(schema_json)
    out, pos = {}, 0
    for name, t in fields:
        out[name], pos = _decode_value(t, buf, pos)
    if pos != len(buf):
        raise ValueError(f"trailing bytes after Avro record ({len(buf) - pos})")
    return out


# --------------------------------------------------------------------------
# Object Container File framing (Avro 1.11 spec, "Object Container
# Files"): magic 'Obj\x01', file-metadata map (avro.schema +
# avro.codec), 16-byte sync marker, then blocks of
# <count, byte-length, data, sync>. This is the on-disk format
# Iceberg manifest / manifest-list files use (iceberg_compat writes
# them through these two functions).
# --------------------------------------------------------------------------

_OCF_MAGIC = b"Obj\x01"


def _sync_marker(schema_json: str | dict) -> bytes:
    """Deterministic 16-byte sync derived from the schema: exports
    are byte-reproducible (no RNG), which the spec allows — the
    marker only has to be consistent within the file."""
    import hashlib

    s = schema_json if isinstance(schema_json, str) else json.dumps(schema_json)
    return hashlib.md5(("mats-ocf:" + s).encode()).digest()


def write_container_file(
    path, schema_json: str | dict, records: list[dict], block_size: int = 1000
) -> None:
    """Write records as an Avro OCF (codec null, deflate-free: spec's
    only REQUIRED codec) with the schema embedded in the header."""
    schema_str = (
        schema_json if isinstance(schema_json, str) else json.dumps(schema_json)
    )
    fields = _record_fields(schema_str)
    sync = _sync_marker(schema_str)
    meta = {"avro.schema": schema_str.encode(), "avro.codec": b"null"}
    buf = bytearray()
    buf += _OCF_MAGIC
    buf += _zigzag_encode(len(meta))
    for k, v in meta.items():
        buf += _encode_value("string", k)
        buf += _encode_value("bytes", v)
    buf += _zigzag_encode(0)  # end of metadata map
    buf += sync
    for i in range(0, len(records), block_size):
        block = records[i : i + block_size]
        body = b"".join(
            b"".join(_encode_value(t, r.get(n)) for n, t in fields)
            for r in block
        )
        buf += _zigzag_encode(len(block))
        buf += _zigzag_encode(len(body))
        buf += body
        buf += sync
    with open(path, "wb") as f:
        f.write(bytes(buf))


def read_container_file(path) -> tuple[dict, list[dict]]:
    """Read an OCF written by any spec-compliant writer (codec null);
    returns (embedded schema as dict, records)."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] != _OCF_MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        count, pos = _zigzag_decode(buf, pos)
        if count == 0:
            break
        if count < 0:  # size-prefixed block (spec-legal)
            count = -count
            _, pos = _zigzag_decode(buf, pos)
        for _ in range(count):
            k, pos = _decode_value("string", buf, pos)
            meta[k], pos = _decode_value("bytes", buf, pos)
    codec = meta.get("avro.codec", b"null")
    if codec != b"null":
        raise ValueError(f"unsupported OCF codec {codec!r}")
    schema = json.loads(meta["avro.schema"].decode())
    fields = _record_fields(schema)
    sync = buf[pos : pos + 16]
    pos += 16
    records: list[dict] = []
    while pos < len(buf):
        count, pos = _zigzag_decode(buf, pos)
        _, pos = _zigzag_decode(buf, pos)  # block byte length
        for _ in range(count):
            rec = {}
            for n, t in fields:
                rec[n], pos = _decode_value(t, buf, pos)
            records.append(rec)
        if buf[pos : pos + 16] != sync:
            raise ValueError(f"{path}: sync marker mismatch at {pos}")
        pos += 16
    return schema, records


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------

def _as_null(t: Any, v: Any) -> Any:
    """Map pandas missing-markers to None — but ONLY where Avro has no
    value for them: NaN in a float/double field is a legal Avro double
    and must be encoded, not nulled; list/dict cells are never
    missing-markers (pd.isna on them is elementwise)."""
    if v is None:
        return None
    inner = t[1] if isinstance(t, tuple) and t[0] == "union" else t
    if inner in ("float", "double"):
        return v
    if isinstance(inner, tuple) and inner[0] in ("array", "map", "record"):
        return v
    import pandas as pd

    return None if pd.isna(v) else v


def to_avro(df: DataFrame, schema_json: str, out_col: str = "avro") -> DataFrame:
    """Encode each row (columns named by the schema) into one binary
    Avro datum column."""
    import pandas as pd

    fields = _record_fields(schema_json)
    names = [n for n, _ in fields]

    def enc(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payload = [
                b"".join(
                    _encode_value(t, _as_null(t, row[n])) for n, t in fields
                )
                for _, row in pdf[names].iterrows()
            ]
            yield pd.DataFrame({out_col: payload})

    return df.mapInPandas(enc, schema=f"{out_col} binary")


def from_avro(
    df: DataFrame, binary_col: str, schema_json: str
) -> DataFrame:
    """Decode a binary Avro-datum column into the schema's columns
    (engine stand-in for spark-avro's from_avro).

    Uses ``mapInArrow`` (not mapInPandas): the pandas return path
    coerces float NaN to null on the Arrow transfer, which both
    corrupts a legal Avro double and violates non-nullable fields —
    building the Arrow arrays directly keeps NaN a value."""
    import pyarrow as pa

    fields = _record_fields(schema_json)
    spark_schema = avro_schema_to_spark_schema(schema_json)

    def dec(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(spark_schema)
        for batch in batches:
            col = batch.column(batch.schema.get_field_index(binary_col))
            rows = [decode_record(schema_json, b.as_py()) for b in col]
            arrays = [
                pa.array(
                    [r[n] for r in rows],
                    type=arrow_schema.field(i).type,
                    from_pandas=False,
                )
                for i, (n, _) in enumerate(fields)
            ]
            yield pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)

    return df.mapInArrow(dec, schema=spark_schema)
