"""Schema utilities.

Reference parity: the silver table schema is declared as an Avro JSON
document and hand-translated to a Spark ``StructType``
(``avro_schema_to_spark_schema``, reference
scripts/bronze-silver.py:22-57): primitive mapping (:24-33), logical
types (:34-38), union->nullable (:44-53), unknown types defaulting to
string (:39). This module re-implements that capability fresh from
the public Avro 1.11 spec, plus helpers used across the engine.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import types as T

_PRIMITIVE = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "bytes": T.BinaryType(),
    "null": T.NullType(),
}

_LOGICAL = {
    "timestamp-micros": T.TimestampType(),
    "timestamp-millis": T.TimestampType(),
    "date": T.DateType(),
    "time-micros": T.LongType(),
    "time-millis": T.IntegerType(),
    "uuid": T.StringType(),
}


def avro_type_to_spark(avro_type: Any) -> tuple[T.DataType, bool]:
    """Translate one Avro type node -> (spark type, nullable).

    Handles primitives, logical types, unions (``['null', X]`` ->
    nullable X), records, arrays, maps, enums, fixed and decimal.
    Unknown names degrade to StringType (matching the reference's
    permissive fallback at scripts/bronze-silver.py:39).
    """
    if isinstance(avro_type, str):
        return _PRIMITIVE.get(avro_type, T.StringType()), False
    if isinstance(avro_type, list):  # union
        non_null = [t for t in avro_type if t != "null"]
        nullable = len(non_null) != len(avro_type)
        if not non_null:
            return T.NullType(), True
        inner, inner_nullable = avro_type_to_spark(non_null[0])
        return inner, nullable or inner_nullable
    if isinstance(avro_type, dict):
        logical = avro_type.get("logicalType")
        if logical == "decimal":
            return (
                T.DecimalType(
                    int(avro_type.get("precision", 38)), int(avro_type.get("scale", 18))
                ),
                False,
            )
        if logical in _LOGICAL:
            return _LOGICAL[logical], False
        kind = avro_type.get("type")
        if kind == "record":
            return avro_record_to_struct(avro_type), False
        if kind == "array":
            item, item_null = avro_type_to_spark(avro_type["items"])
            return T.ArrayType(item, containsNull=item_null), False
        if kind == "map":
            val, val_null = avro_type_to_spark(avro_type["values"])
            return T.MapType(T.StringType(), val, valueContainsNull=val_null), False
        if kind == "enum":
            return T.StringType(), False
        if kind == "fixed":
            return T.BinaryType(), False
        if kind is not None:
            return avro_type_to_spark(kind)
    return T.StringType(), False


def avro_record_to_struct(record: dict[str, Any]) -> T.StructType:
    fields = []
    for f in record.get("fields", []):
        dtype, nullable = avro_type_to_spark(f["type"])
        fields.append(T.StructField(f["name"], dtype, nullable=nullable))
    return T.StructType(fields)


def avro_schema_to_spark_schema(avro_schema: str | dict[str, Any]) -> T.StructType:
    """Avro JSON (string or dict) -> Spark StructType.

    Engine-facing equivalent of reference
    scripts/bronze-silver.py:22-57.
    """
    if isinstance(avro_schema, str):
        avro_schema = json.loads(avro_schema)
    if avro_schema.get("type") != "record":
        raise ValueError("top-level Avro schema must be a record")
    return avro_record_to_struct(avro_schema)


def schema_to_json(schema: T.StructType) -> str:
    """Stable JSON string for snapshot-manifest storage."""
    return schema.json()


def schema_from_json(text: str) -> T.StructType:
    return T.StructType.fromJson(json.loads(text))
