"""Iceberg-spec bucket hashing: 32-bit Murmur3 (x86, seed 0).

The Iceberg table spec (https://iceberg.apache.org/spec/, Appendix B)
defines ``bucket(N, v) = (murmur3_32(serialize(v)) & Int.MAX) % N``
with a fixed per-type serialization:

=============================  =====================================
int / long / date / time /      8-byte little-endian of the value
timestamp / timestamptz         promoted to long (date -> epoch
                                days, time/timestamp -> micros)
decimal(P, S)                   minimal two's-complement big-endian
                                bytes of the unscaled value
string                          UTF-8 bytes
uuid                            16-byte big-endian
fixed / binary                  the bytes themselves
=============================  =====================================

This module provides the hash three ways, all bit-identical and all
checked against the spec's published test vectors
(tests/test_transforms.py):

- :func:`hash_bytes` / :func:`bucket_value` — pure Python, used
  driver-side (export rewrites, partition planning) and as the
  reference implementation the other two are tested against;
- :func:`murmur3_long_col` — a whole-stage-codegen'd Column
  expression for the 8-byte-long family (int/long/date/timestamp),
  the types actually used as bucket keys at scale. ANSI-safe: every
  32-bit multiply is split into 16-bit partial products on BIGINT so
  nothing can overflow;
- :func:`bucket_col` — the full transform Column: the codegen
  expression for the long family, an Arrow-batched pandas UDF
  delegating to the Python reference for the variable-length types
  (string/binary/decimal), null in -> null out (Iceberg's null
  partition) either way.

The reference pipeline creates its Iceberg tables with bucket
partitioning on S3 table buckets (reference scripts/raw-bronze.py);
matching the spec hash makes our hidden ``bucket(N, col)`` transform
produce the exact partition values a real Iceberg runtime would.
"""

from __future__ import annotations

import struct

import pandas  # module-level: pandas_udf type hints resolve via module globals

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF
INT_MAX = 0x7FFFFFFF


# ---------------------------------------------------------------------------
# pure-Python reference
# ---------------------------------------------------------------------------

def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _fmix32(h: int) -> int:
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h


def hash_bytes(data: bytes, seed: int = 0) -> int:
    """Murmur3_x86_32 of ``data``; returns a SIGNED int32 (the Java
    convention the Iceberg vectors are published in)."""
    h = seed & _M32
    n_blocks = len(data) // 4
    for i in range(n_blocks):
        (k,) = struct.unpack_from("<I", data, i * 4)
        k = (k * _C1) & _M32
        k = _rotl32(k, 15)
        k = (k * _C2) & _M32
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & _M32
    tail = data[n_blocks * 4 :]
    k = 0
    for i, b in enumerate(tail):
        k |= b << (8 * i)
    if tail:
        k = (k * _C1) & _M32
        k = _rotl32(k, 15)
        k = (k * _C2) & _M32
        h ^= k
    h ^= len(data)
    h = _fmix32(h)
    return h - (1 << 32) if h >= (1 << 31) else h


def hash_long(v: int) -> int:
    """Spec hash of the 8-byte-long family (int promotes to long)."""
    return hash_bytes(struct.pack("<q", v))


def serialize(value, dt: T.DataType) -> bytes:
    """Iceberg Appendix-B bucket serialization of a Python value of
    Spark type ``dt`` (value must be non-null)."""
    import datetime
    import decimal
    import uuid as _uuid

    if isinstance(value, _uuid.UUID):
        return value.bytes  # 16-byte big-endian, before str() catches it
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return struct.pack("<q", int(value))
    if isinstance(dt, T.DateType):
        days = (value - datetime.date(1970, 1, 1)).days
        return struct.pack("<q", days)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        if value.tzinfo is not None:
            epoch = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
        else:
            epoch = datetime.datetime(1970, 1, 1)
        delta = value - epoch
        micros = (delta.days * 86400 + delta.seconds) * 1_000_000 + delta.microseconds
        return struct.pack("<q", micros)
    if isinstance(dt, T.DecimalType):
        unscaled = int(decimal.Decimal(value).scaleb(dt.scale).to_integral_value())
        length = max(1, (unscaled.bit_length() + 8) // 8)  # +1 sign bit
        return unscaled.to_bytes(length, "big", signed=True)
    if isinstance(dt, T.StringType):
        return str(value).encode("utf-8")
    if isinstance(dt, T.BinaryType):
        return bytes(value)
    if isinstance(value, _uuid.UUID):
        return value.bytes
    raise TypeError(f"bucket transform does not support {dt.simpleString()}")


def bucket_value(value, dt: T.DataType, n: int) -> int | None:
    """Driver-side spec bucket number; None for None (null partition)."""
    if value is None:
        return None
    return (hash_bytes(serialize(value, dt)) & INT_MAX) % n


# ---------------------------------------------------------------------------
# Column expression (8-byte-long family) — whole-stage-codegen'd
# ---------------------------------------------------------------------------

def murmur3_long_col(v: Column) -> Column:
    """Murmur3_x86_32(little-endian-8-bytes(v), seed 0) as a signed
    int32 Column — bit-identical to :func:`hash_long`. ``v`` must be
    BIGINT (callers cast); null yields null.

    Implementation: Spark's native ``Murmur3Hash`` catalyst
    expression with seed 0. For a LONG child its ``hashLong`` is
    exactly the spec algorithm — two little-endian 32-bit blocks then
    ``fmix(h, 8)`` — so only the seed (42 in ``F.hash``) has to
    change, which the public API doesn't expose; the expression is
    constructed directly instead (same class ``F.hash`` builds,
    whole-stage-codegen'd; property-tested against the Python
    reference in tests/test_transforms.py). A hand-built 32-bit
    arithmetic Column tree is NOT an option here: every murmur round
    reuses its state several times, and Column composition copies
    subtrees, so the tree grows exponentially and overflows the
    analyzer. Spark's hash expressions return the SEED for null
    input rather than null, hence the explicit null guard.
    """
    try:
        from pyspark.sql.classic.column import (
            Column as _ClassicColumn,
            _to_java_column,
        )

        from pyspark.sql import SparkSession

        jvm = SparkSession.getActiveSession()._jvm
        eu = jvm.org.apache.spark.sql.classic.ExpressionUtils
        jexpr = eu.expression(_to_java_column(v))
        seq = jvm.PythonUtils.toSeq([jexpr])
        hashed = _ClassicColumn(
            eu.column(
                jvm.org.apache.spark.sql.catalyst.expressions.Murmur3Hash(seq, 0)
            )
        )
    except Exception:  # pragma: no cover - e.g. Spark Connect
        hashed = _murmur3_long_pandas(v)
    return F.when(v.isNotNull(), hashed)


def _murmur3_long_pandas(v: Column) -> Column:
    """Arrow-batched fallback when the catalyst constructor isn't
    reachable (non-classic sessions): same values via the Python
    reference."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _h(s: pandas.Series) -> pandas.Series:
        return s.map(
            lambda x: None if x is None else hash_long(int(x)),
            na_action="ignore",
        ).astype("Int32")

    return _h(v)


_LONG_FAMILY = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def bucket_col(col: Column, dt: T.DataType, n: int) -> Column:
    """Iceberg bucket number of ``col`` (type ``dt``) as a Column.

    Long family (+date/timestamp, promoted exactly as the spec says)
    stays a pure JVM expression; string/binary/decimal delegate to
    the Python reference through an Arrow-batched pandas UDF (bucket
    keys of those types are rare and write-path only). Null -> null,
    Iceberg's null partition.
    """
    if isinstance(dt, _LONG_FAMILY):
        pre = col.cast("bigint")
    elif isinstance(dt, T.DateType):
        pre = F.unix_date(col).cast("bigint")
    elif isinstance(dt, T.TimestampType):
        pre = F.unix_micros(col)
    elif isinstance(dt, T.TimestampNTZType):
        # wall-clock micros since epoch, independent of session zone
        # (unix_micros only accepts the LTZ type)
        pre = F.timestamp_diff(
            "MICROSECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), col
        )
    else:
        return _bucket_python_col(col, dt, n)
    return F.pmod(
        murmur3_long_col(pre).bitwiseAND(F.lit(INT_MAX)), F.lit(n)
    ).cast("int")


def _bucket_python_col(col: Column, dt: T.DataType, n: int) -> Column:
    from pyspark.sql.functions import pandas_udf

    if not isinstance(dt, (T.StringType, T.BinaryType, T.DecimalType)):
        raise TypeError(
            f"bucket transform does not support {dt.simpleString()}"
        )

    @pandas_udf("int")
    def _bucket(s: pandas.Series) -> pandas.Series:
        return s.map(
            lambda v: None if v is None else bucket_value(v, dt, n),
            na_action="ignore",
        ).astype("Int32")

    return _bucket(col)
