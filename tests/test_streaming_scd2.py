"""Streaming SCD2 maintenance: a rate-limited file stream of
dimension snapshots drives scd2_apply per micro-batch through
foreachBatch — the streaming-upsert idiom applied to type-2
history."""

import json

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from medallion_architecture_using_apache_iceberg_table_buckets_spark.lakehouse import (
    Catalog,
)
from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.scd import (
    scd2_apply,
)

DIM_SCHEMA = T.StructType(
    [
        T.StructField("cust_id", T.LongType()),
        T.StructField("segment", T.StringType()),
        T.StructField("valid_from", T.TimestampType()),
        T.StructField("valid_to", T.TimestampType()),
        T.StructField("is_current", T.BooleanType()),
    ]
)

BATCH_SCHEMA = T.StructType(
    [
        T.StructField("cust_id", T.LongType()),
        T.StructField("segment", T.StringType()),
        T.StructField("eff", T.TimestampType()),
    ]
)


def _drop(inbox, name, rows):
    inbox.mkdir(parents=True, exist_ok=True)
    with open(inbox / f"{name}.json", "w") as f:
        for cust, seg, eff in rows:
            f.write(
                json.dumps(
                    {"cust_id": cust, "segment": seg, "eff": eff}
                )
                + "\n"
            )


def test_streaming_scd2_apply(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    dim = cat.create_table("d", "dim", DIM_SCHEMA)
    inbox = tmp_path / "inbox"
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = (
            spark.readStream.schema(BATCH_SCHEMA)
            .option("maxFilesPerTrigger", "1")  # one batch per file
            .json(str(inbox))
        )

        def sink(batch_df, batch_id):
            if batch_df.isEmpty():
                return
            # latest snapshot per key within the micro-batch
            latest = (
                batch_df.withColumn(
                    "_rn",
                    F.row_number().over(
                        Window.partitionBy("cust_id")
                        .orderBy(F.desc("eff"))
                    ),
                )
                .filter("_rn = 1")
                .drop("_rn")
            )
            scd2_apply(
                spark, dim, latest, ["cust_id"], ["segment"], "eff"
            )

        (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    _drop(inbox, "b1", [(1, "gold", "2024-01-01T00:00:00"),
                        (2, "silver", "2024-01-01T00:00:00")])
    drain()
    _drop(inbox, "b2", [(1, "platinum", "2024-02-01T00:00:00"),
                        (3, "bronze", "2024-02-01T00:00:00")])
    drain()

    rows = dim.read(spark).collect()
    cur = {r["cust_id"]: r["segment"] for r in rows if r["is_current"]}
    assert cur == {1: "platinum", 2: "silver", 3: "bronze"}
    closed = [r for r in rows if not r["is_current"]]
    assert len(closed) == 1 and closed[0]["cust_id"] == 1
    assert closed[0]["segment"] == "gold"
    assert closed[0]["valid_to"] is not None
    # exactly-once across a re-drain with no new files
    n = len(rows)
    drain()
    assert dim.read(spark).count() == n
