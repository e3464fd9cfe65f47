"""Property-based tests (hypothesis) for the pure-Python layers and
invariant checks on the core operators."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from medallion_architecture_using_apache_iceberg_table_buckets_spark.schema import (
    avro_schema_to_spark_schema,
    schema_from_json,
    schema_to_json,
)

AVRO_PRIMS = ["string", "int", "long", "float", "double", "boolean", "bytes"]

avro_field_type = st.one_of(
    st.sampled_from(AVRO_PRIMS),
    st.sampled_from(AVRO_PRIMS).map(lambda t: ["null", t]),
    st.sampled_from(
        [
            {"type": "long", "logicalType": "timestamp-micros"},
            {"type": "int", "logicalType": "date"},
            {"type": "array", "items": "string"},
            {"type": "map", "values": "double"},
            {"type": "bytes", "logicalType": "decimal", "precision": 10, "scale": 2},
        ]
    ),
)

field_names = st.lists(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=12),
    min_size=1,
    max_size=8,
    unique=True,
)


@given(names=field_names, types=st.lists(avro_field_type, min_size=8, max_size=8))
@settings(max_examples=60, deadline=None)
def test_avro_translator_total_and_roundtrippable(names, types):
    """Any well-formed Avro record translates, field count/order/
    nullability are preserved, and the resulting StructType survives a
    JSON round trip (the manifest storage path)."""
    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": n, "type": t} for n, t in zip(names, types)],
    }
    out = avro_schema_to_spark_schema(json.dumps(schema))
    assert [f.name for f in out.fields] == names
    for f, t in zip(out.fields, types[: len(names)]):
        assert f.nullable == (isinstance(t, list) and "null" in t)
    assert schema_from_json(schema_to_json(out)) == out


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),  # key
            st.integers(min_value=0, max_value=1_000_000),  # order value
            st.text(alphabet="abc", min_size=0, max_size=4),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=15, deadline=None)
def test_keep_latest_per_key_invariants(spark, rows):
    """keep_latest_per_key: one row per key, and it is the maximal
    (order, uniq) row — for arbitrary inputs including ties."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators import (
        keep_latest_per_key,
    )

    df = spark.createDataFrame(
        [(k, o, i, v) for i, (k, o, v) in enumerate(rows)],
        "k long, o long, uniq long, v string",
    )
    out = keep_latest_per_key(df, ["k"], ["o", "uniq"]).collect()
    expected = {}
    for i, (k, o, v) in enumerate(rows):
        if k not in expected or (expected[k][1], expected[k][2]) < (o, i):
            expected[k] = (k, o, i)
    assert {(r["k"], r["o"], r["uniq"]) for r in out} == set(expected.values())


@given(
    ids=st.lists(st.integers(min_value=0, max_value=50), min_size=2, max_size=30),
)
@settings(max_examples=10, deadline=None)
def test_merge_idempotent_and_key_unique(spark, tmp_path_factory, ids):
    """MERGE INTO with a deduped source: target keys stay unique and
    re-merging the same source is a no-op on the data."""
    from pyspark.sql import types as T

    from medallion_architecture_using_apache_iceberg_table_buckets_spark.lakehouse import (
        Catalog,
        merge_into,
    )

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
    )
    cat = Catalog(tmp_path_factory.mktemp("wh"))
    t = cat.create_table("p", "t", schema)
    src = spark.createDataFrame([(i, i * 10) for i in set(ids)], schema)
    merge_into(spark, t, src, on="id")
    merge_into(spark, t, src, on="id")
    rows = t.read(spark).collect()
    assert len(rows) == len(set(ids))
    assert {(r["id"], r["v"]) for r in rows} == {(i, i * 10) for i in set(ids)}


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("aa bb cc dd ee ff gg hh".split()),
            min_size=0,
            max_size=10,
        ),
        min_size=1,
        max_size=12,
    ),
    n=st.integers(min_value=2, max_value=4),
)
@settings(max_examples=12, deadline=None)
def test_decontaminate_matches_bruteforce(spark, docs, n):
    """decontaminate_ngram_overlap == brute-force n-gram set algebra
    for arbitrary tiny corpora: every odd-id doc is 'benchmark', the
    rest 'training'; the operator must report exactly the training
    docs with a shared n-gram and the exact distinct counts."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.dedup import (
        decontaminate_ngram_overlap,
    )

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bench = df.filter("doc_id % 2 = 1")
    train = df.filter("doc_id % 2 = 0")
    got = {
        r["doc_id"]: (r["n_shared"], r["n_shingles"])
        for r in decontaminate_ngram_overlap(train, bench, n=n).collect()
    }

    def grams(words):
        return {
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        }

    bench_grams = set()
    for i, words in enumerate(docs):
        if i % 2 == 1:
            bench_grams |= grams(words)
    expected = {}
    for i, words in enumerate(docs):
        if i % 2 == 0:
            g = grams(words)
            shared = g & bench_grams
            if shared:
                expected[i] = (len(shared), len(g))
    assert got == expected


_word = st.sampled_from(
    ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
     "hotel", "india", "juliet", "kilo", "lima"]
)
_doc_text = st.lists(_word, min_size=3, max_size=14).map(" ".join)


@given(docs=st.lists(_doc_text, min_size=2, max_size=8, unique=True))
@settings(max_examples=12, deadline=None)
def test_containment_dominates_jaccard(spark, docs):
    """For every candidate pair, containment >= jaccard (the
    intersection is divided by the smaller set instead of the union),
    and containment values never exceed 1.0. Run with threshold 0 on
    both operators so the full candidate set is compared."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators import dedup as D

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(df, threshold=0.0).collect()
    }
    cont = D.containment_pairs(df, threshold=0.0).collect()
    assert all(0.0 <= r["containment"] <= 1.0 for r in cont)
    for r in cont:
        pair = tuple(sorted((r["inner_doc"], r["outer_doc"])))
        assert pair in jac
        assert r["containment"] >= jac[pair] - 1e-9


@given(docs=st.lists(_doc_text, min_size=2, max_size=8, unique=True))
@settings(max_examples=10, deadline=None)
def test_incremental_probe_equals_self_join_restriction(spark, docs):
    """Probing NEW against HIST returns exactly the cross-side subset
    of the full self-join's pairs: no pair invented, no cross-side
    pair lost, and never a hist-hist or new-new pair."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators import dedup as D

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hist = df.filter("doc_id % 2 = 0")
    new = df.filter("doc_id % 2 = 1")
    probe = {
        (r["new_doc"], r["hist_doc"], r["jaccard"])
        for r in D.minhash_lsh_probe(new, hist, threshold=0.2).collect()
    }
    full = D.minhash_lsh_pairs(df, threshold=0.2).collect()
    cross = set()
    for r in full:
        a, b = r["doc_a"], r["doc_b"]
        if a % 2 != b % 2:  # one new, one hist
            n, h = (a, b) if a % 2 == 1 else (b, a)
            cross.add((n, h, r["jaccard"]))
    assert probe == cross


@given(
    w=st.integers(1, 12),
    h=st.integers(1, 10),
    ch=st.sampled_from([1, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=10),
)
@settings(max_examples=60, deadline=None)
def test_png_codec_roundtrip_property(w, h, ch, seed, filters):
    """Any geometry x channel-count x per-row filter assignment
    round-trips bit-exactly through the stdlib PNG codec — decode
    recovers the exact sample bytes, not just the checksum."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.multimodal import (
        decode_pixels,
        encode_png,
    )

    n = ch * w * h
    pix = bytes((seed * 2654435761 + 97 * i) % 256 for i in range(n))
    blob = encode_png(
        w, h, pix, ch,
        filter_for_row=lambda r: filters[r % len(filters)],
    )
    d = decode_pixels(blob)
    assert (d["width"], d["height"], d["channels"]) == (w, h, ch)
    assert d["pixels"] == pix


@given(
    w=st.integers(1, 10),
    h=st.integers(1, 8),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_bmp_pixel_roundtrip_property(w, h, seed):
    """BMP row padding / bottom-up BGR storage round-trips exactly
    for every width (padding 0-3 bytes) and content."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.multimodal import (
        decode_pixels,
        encode_bmp,
    )

    pix = bytes((seed + 13 * i) % 256 for i in range(3 * w * h))
    assert decode_pixels(encode_bmp(w, h, pix))["pixels"] == pix
