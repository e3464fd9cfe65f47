"""Avro binary codec: known-byte vectors from the public spec,
round-trip properties, and the Spark from_avro/to_avro surface over
the reference's own orders schema (scripts/bronze-silver.py:236-253)."""

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from medallion_architecture_using_apache_iceberg_table_buckets_spark.functions.avro_codec import (
    _zigzag_decode,
    _zigzag_encode,
    decode_record,
    encode_record,
    from_avro,
    to_avro,
)

# the reference's silver schema, verbatim shape
ORDERS_SCHEMA = """
{
  "type": "record",
  "name": "orders",
  "fields": [
    {"name": "replicadmstimestamp", "type": {"type": "long", "logicalType": "timestamp-micros"}},
    {"name": "invoiceid", "type": "long"},
    {"name": "itemid", "type": "long"},
    {"name": "category", "type": "string"},
    {"name": "price", "type": "double"},
    {"name": "quantity", "type": "int"},
    {"name": "orderdate", "type": {"type": "int", "logicalType": "date"}},
    {"name": "destinationstate", "type": ["null", "string"]}
  ]
}
"""


def test_zigzag_spec_vectors():
    # Avro 1.11 spec examples: 0->00, -1->01, 1->02, -2->03, 2->04
    for n, b in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
                 (2, b"\x04"), (-64, b"\x7f"), (64, b"\x80\x01")]:
        assert _zigzag_encode(n) == b, n
        assert _zigzag_decode(b, 0) == (n, len(b))


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_zigzag_roundtrip(n):
    v, pos = _zigzag_decode(_zigzag_encode(n), 0)
    assert v == n


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=-(2**62), max_value=2**62),
    st.text(max_size=40),
    st.floats(allow_nan=False, allow_infinity=False),
    st.integers(min_value=-(2**31), max_value=2**31 - 1),
    st.one_of(st.none(), st.text(max_size=10)),
)
def test_record_roundtrip(inv, cat, price, qty, state):
    rec = {
        "replicadmstimestamp": datetime.datetime(2024, 5, 1, 12, 30, 15, 123456),
        "invoiceid": inv,
        "itemid": 7,
        "category": cat,
        "price": price,
        "quantity": qty,
        "orderdate": datetime.date(2024, 5, 1),
        "destinationstate": state,
    }
    assert decode_record(ORDERS_SCHEMA, encode_record(ORDERS_SCHEMA, rec)) == rec


def test_spark_from_to_avro_roundtrip(spark):
    rows = [
        (datetime.datetime(2024, 1, 1, 8, 0, 0), 1, 10, "Office", 12.5, 2,
         datetime.date(2024, 1, 1), "CA"),
        (datetime.datetime(2024, 1, 2, 9, 30, 0), 2, 20, "Books", 7.25, 1,
         datetime.date(2024, 1, 2), None),
    ]
    ddl = ("replicadmstimestamp timestamp, invoiceid long, itemid long, "
           "category string, price double, quantity int, orderdate date, "
           "destinationstate string")
    df = spark.createDataFrame(rows, ddl)
    encoded = to_avro(df, ORDERS_SCHEMA)
    assert dict(encoded.dtypes)["avro"] == "binary"
    decoded = from_avro(encoded, "avro", ORDERS_SCHEMA)
    got = sorted(
        (tuple(r) for r in decoded.collect()), key=lambda t: t[1]
    )
    assert got == sorted(rows, key=lambda t: t[1])
