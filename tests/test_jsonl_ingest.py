"""JSONL batch source (pipeline/ingest.py:read_jsonl_batch): declared
schema, PERMISSIVE corrupt-line capture, quarantine split — the LLM-
corpus counterpart of the reference's CSV ingest."""

import json

from pyspark.sql import types as T

from medallion_architecture_using_apache_iceberg_table_buckets_spark.pipeline.ingest import (
    read_jsonl_batch,
    split_quarantine,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("meta", T.StructType([T.StructField("lang", T.StringType())])),
    ]
)


def _write(tmp_path, name, lines):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_clean_and_corrupt_lines_split(spark, tmp_path):
    f = _write(
        tmp_path,
        "a.jsonl",
        [
            json.dumps({"doc_id": 1, "text": "hello", "meta": {"lang": "en"}}),
            "{this is not json",
            json.dumps({"doc_id": 2, "text": "welt", "meta": {"lang": "de"}}),
            '["an", "array", "not", "an", "object"]',
        ],
    )
    df = read_jsonl_batch(
        spark, [f], schema=SCHEMA, corrupt_record_col="_corrupt_record"
    )
    clean, quarantine = split_quarantine(df)
    got = {r["doc_id"]: r for r in clean.collect()}
    assert set(got) == {1, 2}
    assert got[1]["meta"]["lang"] == "en"
    assert "_corrupt_record" not in clean.columns
    bad = [r["_corrupt_record"] for r in quarantine.collect()]
    assert len(bad) == 2
    assert any("not json" in b for b in bad)


def test_schema_declared_no_inference_missing_fields_null(spark, tmp_path):
    f = _write(
        tmp_path,
        "b.jsonl",
        [
            json.dumps({"doc_id": 7, "text": "no meta here"}),
            json.dumps({"doc_id": 8, "extra_field": "ignored", "text": "x"}),
        ],
    )
    df = read_jsonl_batch(spark, [f], schema=SCHEMA)
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows[7]["meta"] is None
    assert rows[8]["text"] == "x"
    assert "extra_field" not in df.columns


def test_dropmalformed_mode(spark, tmp_path):
    f = _write(
        tmp_path,
        "c.jsonl",
        [json.dumps({"doc_id": 1, "text": "ok"}), "oops"],
    )
    df = read_jsonl_batch(spark, [f], schema=SCHEMA, mode="DROPMALFORMED")
    assert df.count() == 1


def test_orc_batch_roundtrip_and_pushdown(spark, tmp_path):
    """ORC batch scan: declared-schema read matches the written rows
    and filters push into the native ORC scan."""
    from pyspark.sql import types as T

    from medallion_architecture_using_apache_iceberg_table_buckets_spark.pipeline.ingest import (
        read_orc_batch,
    )

    sch = T.StructType.fromDDL("id long, name string, amount double")
    rows = [(i, f"n{i}", float(i) * 1.5) for i in range(50)]
    src = str(tmp_path / "orc_in")
    spark.createDataFrame(rows, sch).write.orc(src)
    import glob

    files = sorted(glob.glob(f"{src}/*.orc"))
    assert files
    df = read_orc_batch(spark, files, schema=sch)
    assert sorted(tuple(r) for r in df.collect()) == sorted(rows)
    plan = (
        df.filter("amount > 30")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "amount" in plan
