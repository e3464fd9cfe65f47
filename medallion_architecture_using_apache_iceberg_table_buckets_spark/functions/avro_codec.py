"""Pure-Python Avro binary codec + Spark from_avro/to_avro.

The reference imports ``from_avro``/``to_avro``
(scripts/bronze-silver.py:15) from spark-avro, whose jar is absent
from this environment. Rather than leave the data plane untranslated,
this module implements the Avro 1.11 BINARY ENCODING (public spec:
zigzag-varint ints/longs, little-endian IEEE floats, length-prefixed
strings/bytes, union-index prefix, logical date = days-int and
timestamp-micros = long) for the type subset the reference's schema
uses — records of primitives, ``['null', X]`` unions, and
date / timestamp logical types.

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
    """Collapse a field type to one of: primitive name, ('union', t),
    ('date',), ('timestamp',)."""
    if isinstance(t, list):
        non_null = [x for x in t if x != "null"]
        if len(t) == 2 and len(non_null) == 1:
            return ("union", _norm_type(non_null[0]))
        raise ValueError(f"unsupported Avro union {t!r} (only [null, X])")
    if isinstance(t, dict):
        logical = t.get("logicalType")
        if logical == "date":
            return ("date",)
        if logical in ("timestamp-micros", "timestamp-millis"):
            return ("timestamp", logical)
        return _norm_type(t["type"])
    if t in ("string", "int", "long", "float", "double", "boolean", "bytes"):
        return t
    raise ValueError(f"unsupported Avro type {t!r}")


def _encode_value(t: Any, v: Any) -> bytes:
    if isinstance(t, tuple) and t[0] == "union":
        if v is None:
            return _zigzag_encode(0)  # branch 0 = null
        return _zigzag_encode(1) + _encode_value(t[1], v)
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
    raise ValueError(f"unsupported Avro type {t!r}")


def _decode_value(t: Any, buf: bytes, pos: int) -> tuple[Any, int]:
    if isinstance(t, tuple) and t[0] == "union":
        branch, pos = _zigzag_decode(buf, pos)
        if branch == 0:
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
# Spark surface
# --------------------------------------------------------------------------

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
                    _encode_value(t, None if pd.isna(row[n]) else row[n])
                    for n, t in fields
                )
                for _, row in pdf[names].iterrows()
            ]
            yield pd.DataFrame({out_col: payload})

    return df.mapInPandas(enc, schema=f"{out_col} binary")


def from_avro(
    df: DataFrame, binary_col: str, schema_json: str
) -> DataFrame:
    """Decode a binary Avro-datum column into the schema's columns
    (engine stand-in for spark-avro's from_avro)."""
    import pandas as pd

    fields = _record_fields(schema_json)
    spark_schema = avro_schema_to_spark_schema(schema_json)

    def dec(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [decode_record(schema_json, b) for b in pdf[binary_col]]
            yield pd.DataFrame(
                {n: [r[n] for r in rows] for n, _ in fields}
            )

    return df.mapInPandas(dec, schema=spark_schema)
