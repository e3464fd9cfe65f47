"""Stock-signature ``from_avro`` / ``to_avro`` Column functions.

The reference imports these from ``pyspark.sql.avro.functions``
(scripts/bronze-silver.py:15), which only work when the external
``spark-avro`` jar is on the session classpath — absent in this
container. This module provides the same call surface:

- when the jar IS loaded, both functions delegate to the stock JVM
  implementation verbatim (probed once per session, cached);
- otherwise they fall back to an Arrow-serialized Python UDF over
  the same binary-datum codec as ``avro_codec`` (zigzag/varint spec
  encoding, spec-vector tested). NaN survives: the Arrow UDF path
  carries doubles without the pandas NaN->null coercion that makes
  ``mapInPandas`` unsafe here (probed in tests).

API parity notes vs spark-avro:
- ``from_avro(data, jsonFormatSchema, options)`` honors
  ``options["mode"]``: FAILFAST (default) raises on a corrupt datum,
  PERMISSIVE yields a null struct — the same two modes the stock
  function accepts.
- ``to_avro(data, jsonFormatSchema)``: the stock function can infer
  the Avro schema from the Catalyst type when the argument is
  omitted; the fallback cannot see the Catalyst type from inside a
  UDF, so the schema argument is REQUIRED offline (a clear error
  says so). Pass the same record schema you would give from_avro.

Scale note: this Column surface is the API-compat path — per-datum
record shredding is inherently row-wise, so the fallback pays one
Python call per row (Arrow-batched transport). For bulk decode in a
pipeline hot path prefer ``avro_codec.from_avro`` / ``.to_avro``
(mapInArrow over whole batches); semantics are identical and tested
as interoperable both directions.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from .avro_codec import (
    _as_null,
    _encode_value,
    _record_fields,
    avro_schema_to_spark_schema,
    decode_record,
)

# Probe result cached PER SESSION (keyed on the SparkSession object
# id): a module-global bool would pin the first probe's answer forever,
# so a probe made before any session exists — or against a jarless
# session later replaced by a jar-loaded one — would permanently force
# the UDF fallback. No active session -> return False WITHOUT caching.
_JVM_AVAILABLE: dict[int, bool] = {}


def _jvm_avro_loaded() -> bool:
    """True iff the spark-avro data source is registered in the
    active session's JVM (probe once per session, cache)."""
    spark = SparkSession.getActiveSession()
    if spark is None:
        return False
    key = id(spark)
    if key in _JVM_AVAILABLE:
        return _JVM_AVAILABLE[key]
    try:
        # the class object always resolves lazily through py4j; only a
        # real call proves the data source is loaded, so probe with a
        # tiny expression the driver can evaluate eagerly
        from pyspark.sql.avro.functions import to_avro as _stock_to_avro

        df = spark.range(1).select(_stock_to_avro(F.struct(F.lit(1).alias("x"))))
        df.collect()
        _JVM_AVAILABLE[key] = True
    except Exception:
        _JVM_AVAILABLE[key] = False
    return _JVM_AVAILABLE[key]


def from_avro(
    data: Column | str, jsonFormatSchema: str, options: dict | None = None
) -> Column:
    """Decode a binary Avro-datum column into a struct column
    (stock-signature twin of ``pyspark.sql.avro.functions.from_avro``)."""
    if _jvm_avro_loaded():
        from pyspark.sql.avro.functions import from_avro as _stock

        return _stock(data, jsonFormatSchema, options or {})

    mode = (options or {}).get("mode", "FAILFAST").upper()
    if mode not in ("FAILFAST", "PERMISSIVE"):
        raise ValueError(f"from_avro mode must be FAILFAST or PERMISSIVE, got {mode!r}")
    spark_schema = avro_schema_to_spark_schema(jsonFormatSchema)

    @F.udf(returnType=spark_schema, useArrow=True)
    def _decode(b: bytes | None) -> Any:
        if b is None:
            return None
        try:
            return decode_record(jsonFormatSchema, b)
        except Exception:
            if mode == "PERMISSIVE":
                return None
            raise

    return _decode(data)


def to_avro(data: Column | str, jsonFormatSchema: str | None = None) -> Column:
    """Encode a struct column into one binary Avro datum per row
    (stock-signature twin of ``pyspark.sql.avro.functions.to_avro``)."""
    if _jvm_avro_loaded():
        from pyspark.sql.avro.functions import to_avro as _stock

        return (
            _stock(data, jsonFormatSchema)
            if jsonFormatSchema
            else _stock(data)
        )

    if not jsonFormatSchema:
        raise ValueError(
            "to_avro without jsonFormatSchema needs the spark-avro jar "
            "(the stock function infers the Avro schema from the Catalyst "
            "type); offline, pass the record schema explicitly"
        )
    fields = _record_fields(jsonFormatSchema)

    @F.udf(returnType="binary", useArrow=True)
    def _encode(row: Any) -> bytes | None:
        if row is None:
            return None
        rec = row.asDict(recursive=False) if hasattr(row, "asDict") else dict(row)
        return b"".join(_encode_value(t, _as_null(t, rec.get(n))) for n, t in fields)

    return _encode(data)
