"""Avro binary codec: known-byte vectors from the public spec,
round-trip properties, and the Spark from_avro/to_avro surface over
the reference's own orders schema (scripts/bronze-silver.py:236-253)."""

import datetime
import json
import math

from pyspark.sql import functions as F

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


# ---------------------------------------------------------------------------
# round-3 breadth: unions in declared order, NaN doubles, complex types
# ---------------------------------------------------------------------------

COMPLEX_SCHEMA = """
{
  "type": "record",
  "name": "doc",
  "fields": [
    {"name": "id", "type": "long"},
    {"name": "tags", "type": {"type": "array", "items": "string"}},
    {"name": "scores", "type": {"type": "map", "values": "double"}},
    {"name": "geo", "type": {"type": "record", "name": "geo",
        "fields": [{"name": "lat", "type": "double"},
                   {"name": "lon", "type": "double"}]}},
    {"name": "status", "type": {"type": "enum", "name": "st",
        "symbols": ["NEW", "OPEN", "DONE"]}},
    {"name": "digest", "type": {"type": "fixed", "name": "md5x", "size": 4}},
    {"name": "maybe_nums", "type": ["null", {"type": "array", "items": "long"}]}
  ]
}
"""


def test_array_spec_vector():
    # Avro spec: the long array [3, 27] encodes as 04 06 36 00
    sc = {"type": "record", "name": "r",
          "fields": [{"name": "a", "type": {"type": "array", "items": "long"}}]}
    assert encode_record(sc, {"a": [3, 27]}) == b"\x04\x06\x36\x00"
    assert decode_record(sc, b"\x04\x06\x36\x00") == {"a": [3, 27]}
    assert encode_record(sc, {"a": []}) == b"\x00"
    # negative block count with byte-size prefix is spec-legal input
    assert decode_record(sc, b"\x03\x04\x06\x36\x00") == {"a": [3, 27]}


def test_union_branch_follows_declared_order():
    # ["null","string"]: null = branch 0; ["string","null"]: null = 1
    null_first = {"type": "record", "name": "r",
                  "fields": [{"name": "x", "type": ["null", "string"]}]}
    null_last = {"type": "record", "name": "r",
                 "fields": [{"name": "x", "type": ["string", "null"]}]}
    assert encode_record(null_first, {"x": None}) == b"\x00"
    assert encode_record(null_last, {"x": None}) == b"\x02"  # branch 1
    assert encode_record(null_first, {"x": "a"}) == b"\x02\x02a"
    assert encode_record(null_last, {"x": "a"}) == b"\x00\x02a"  # branch 0
    for sc in (null_first, null_last):
        for v in (None, "hello"):
            assert decode_record(sc, encode_record(sc, {"x": v})) == {"x": v}


def test_complex_record_roundtrip():
    rec = {
        "id": 7,
        "tags": ["a", "b", "c"],
        "scores": {"q": 1.5, "r": -2.25},
        "geo": {"lat": 48.85, "lon": 2.35},
        "status": "OPEN",
        "digest": b"\x01\x02\x03\x04",
        "maybe_nums": [10, 20],
    }
    buf = encode_record(COMPLEX_SCHEMA, rec)
    assert decode_record(COMPLEX_SCHEMA, buf) == rec
    rec2 = dict(rec, maybe_nums=None, tags=[], scores={})
    assert decode_record(COMPLEX_SCHEMA, encode_record(COMPLEX_SCHEMA, rec2)) == rec2
    # enum symbol outside the declared set fails loudly
    import pytest
    with pytest.raises(ValueError, match="enum symbol"):
        encode_record(COMPLEX_SCHEMA, dict(rec, status="NOPE"))
    with pytest.raises(ValueError, match="fixed"):
        encode_record(COMPLEX_SCHEMA, dict(rec, digest=b"\x01"))


def test_nan_double_is_a_value_not_null():
    import math

    sc = {"type": "record", "name": "r",
          "fields": [{"name": "d", "type": "double"},
                     {"name": "maybe_d", "type": ["null", "double"]}]}
    buf = encode_record(sc, {"d": float("nan"), "maybe_d": float("nan")})
    out = decode_record(sc, buf)
    assert math.isnan(out["d"]) and math.isnan(out["maybe_d"])


def test_spark_to_avro_nan_double(spark):
    """A NaN in a non-nullable double column must encode as IEEE NaN
    through the mapInPandas path (pd.isna would have nulled it)."""
    import math

    sc = ('{"type": "record", "name": "r", "fields": ['
          '{"name": "id", "type": "long"}, {"name": "d", "type": "double"}]}')
    df = spark.createDataFrame([(1, float("nan")), (2, 2.5)], "id long, d double")
    back = from_avro(to_avro(df, sc), "avro", sc).collect()
    got = {r["id"]: r["d"] for r in back}
    assert math.isnan(got[1]) and got[2] == 2.5


def test_spark_complex_roundtrip(spark):
    """Arrays/maps/nested records survive the Spark surface (Arrow
    batch -> Avro bytes -> Arrow batch)."""
    sc = COMPLEX_SCHEMA
    rows = [
        (1, ["x"], {"a": 1.0}, (1.0, 2.0), "NEW", b"\xde\xad\xbe\xef", [1, 2]),
        (2, [], {}, (-3.5, 4.5), "DONE", b"\x00\x00\x00\x00", None),
    ]
    df = spark.createDataFrame(
        rows,
        "id long, tags array<string>, scores map<string,double>, "
        "geo struct<lat:double,lon:double>, status string, digest binary, "
        "maybe_nums array<bigint>",
    )
    from pyspark.sql import functions as F

    enc = to_avro(df, sc)
    back = from_avro(enc, "avro", sc).orderBy("id").collect()
    assert back[0]["tags"] == ["x"]
    assert back[0]["scores"] == {"a": 1.0}
    assert back[0]["geo"]["lon"] == 2.0
    assert back[1]["status"] == "DONE"
    assert back[1]["maybe_nums"] is None
    assert back[0]["digest"] == bytearray(b"\xde\xad\xbe\xef")


# -- stock-signature Column shim (functions/avro_functions.py) --------------


SHIM_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "shim",
        "fields": [
            {"name": "x", "type": "long"},
            {"name": "d", "type": "double"},
            {"name": "s", "type": ["null", "string"]},
        ],
    }
)


def test_shim_column_roundtrip(spark):
    """from_avro(to_avro(struct)) with the stock call shape, offline
    (no spark-avro jar): values, nulls and NaN all survive."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.functions import (
        from_avro,
        to_avro,
    )

    df = spark.createDataFrame(
        [(1, 1.5, "a"), (2, float("nan"), None)], "x long, d double, s string"
    )
    enc = df.select(to_avro(F.struct("x", "d", "s"), SHIM_SCHEMA).alias("bin"))
    dec = enc.select(from_avro("bin", SHIM_SCHEMA).alias("r")).select(
        "r.x", "r.d", "r.s"
    )
    rows = sorted(dec.collect(), key=lambda r: r.x)
    assert [r.x for r in rows] == [1, 2]
    assert rows[0].d == 1.5 and rows[0].s == "a"
    assert math.isnan(rows[1].d)  # NaN is a value, not null
    assert rows[1].s is None


def test_shim_interops_with_mapinarrow_codec(spark):
    """Bytes written by the Column shim decode through the bulk
    mapInArrow codec and vice versa — one wire format."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.functions import (
        from_avro,
        to_avro,
    )
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.functions import (
        avro_codec as C,
    )

    df = spark.createDataFrame([(7, 2.25, "z")], "x long, d double, s string")
    # shim-encoded -> codec-decoded
    enc_shim = df.select(to_avro(F.struct("x", "d", "s"), SHIM_SCHEMA).alias("avro"))
    via_codec = C.from_avro(enc_shim, "avro", SHIM_SCHEMA).collect()[0]
    assert (via_codec.x, via_codec.d, via_codec.s) == (7, 2.25, "z")
    # codec-encoded -> shim-decoded
    enc_codec = C.to_avro(df, SHIM_SCHEMA, out_col="bin")
    via_shim = (
        enc_codec.select(from_avro("bin", SHIM_SCHEMA).alias("r"))
        .select("r.x", "r.d", "r.s")
        .collect()[0]
    )
    assert (via_shim.x, via_shim.d, via_shim.s) == (7, 2.25, "z")


def test_shim_corrupt_datum_modes(spark):
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.functions import (
        from_avro,
    )

    bad = spark.createDataFrame([(bytearray(b"\xff"),)], "bin binary")
    # PERMISSIVE: corrupt datum -> null struct
    row = bad.select(from_avro("bin", SHIM_SCHEMA, {"mode": "PERMISSIVE"}).alias("r")).collect()[0]
    assert row.r is None
    # FAILFAST (default): raises
    import pytest as _pytest

    with _pytest.raises(Exception):
        bad.select(from_avro("bin", SHIM_SCHEMA).alias("r")).collect()
    with _pytest.raises(ValueError):
        from_avro("bin", SHIM_SCHEMA, {"mode": "DROPMALFORMED"})


def test_shim_to_avro_requires_schema_offline(spark):
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.functions import (
        avro_functions as AF,
    )

    if AF._jvm_avro_loaded():  # pragma: no cover - jarful environments
        return
    import pytest as _pytest

    with _pytest.raises(ValueError, match="spark-avro"):
        AF.to_avro(F.struct(F.lit(1).alias("x")))


def test_container_file_roundtrip(tmp_path):
    """OCF framing: header map, deterministic sync, multi-block body
    read back losslessly — including 2-branch unions, arrays of
    records (Iceberg's map encoding), and enough records to force
    several blocks."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.functions.avro_codec import (
        read_container_file,
        write_container_file,
    )

    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "s", "type": ["null", "string"], "default": None},
            {
                "name": "kv",
                "type": [
                    "null",
                    {
                        "type": "array",
                        "logicalType": "map",
                        "items": {
                            "type": "record",
                            "name": "pair",
                            "fields": [
                                {"name": "key", "type": "int"},
                                {"name": "value", "type": "bytes"},
                            ],
                        },
                    },
                ],
                "default": None,
            },
        ],
    }
    records = [
        {
            "k": i,
            "s": None if i % 3 == 0 else f"v{i}",
            "kv": None if i % 5 == 0 else [{"key": i, "value": bytes([i % 256])}],
        }
        for i in range(2500)  # > 2 blocks at the default block_size
    ]
    p = tmp_path / "t.avro"
    write_container_file(p, schema, records)
    got_schema, got = read_container_file(p)
    assert got_schema == schema
    assert got == records
    # header magic per spec
    assert p.read_bytes()[:4] == b"Obj\x01"
    # byte-reproducible export (deterministic sync marker)
    p2 = tmp_path / "t2.avro"
    write_container_file(p2, schema, records)
    assert p.read_bytes() == p2.read_bytes()
