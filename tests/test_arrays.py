"""Array-typed semantics for the complex-type operators.

The contract queries serialize arrays with array_join so the driver's
canonicalizer can hash them; these tests keep the array-typed form
verified (element order, types, higher-order results).
"""

from pyspark.sql import functions as F

from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.relational import (
    agg_collect_sorted,
    array_map_funcs,
    load,
)


def test_agg_collect_sorted_array_form(spark, sf_dir):
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    arr = (
        o.groupBy("o_custkey")
        .agg(F.sort_array(F.collect_list("o_orderpriority")).alias("priorities"))
        .orderBy("o_custkey")
        .limit(5)
        .collect()
    )
    ser = {
        r["o_custkey"]: r["priorities"]
        for r in agg_collect_sorted(spark, sf_dir).collect()
    }
    for row in arr:
        assert row["priorities"] == sorted(row["priorities"])
        assert ser[row["o_custkey"]] == ",".join(row["priorities"])


def test_array_map_funcs_matches_python_semantics(spark, sf_dir):
    rows = array_map_funcs(spark, sf_dir).limit(50).collect()
    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .select("event_id", "user_id")
        .collect()
    )
    by_id = {r["event_id"]: r["user_id"] for r in e}
    assert rows
    for r in rows:
        uid = by_id[r["event_id"]]
        arr = [r["event_id"], uid, r["event_id"] + uid]
        assert r["arr_third"] == arr[2]
        assert r["has_user"] is True
        assert r["n_even"] == sum(1 for x in arr if x % 2 == 0)
        assert r["first_doubled"] == arr[0] * 2
        assert r["map_uid"] == uid
        assert r["arr_max"] == max(arr)
        assert r["arr_sorted_desc"] == ",".join(
            str(x) for x in sorted(arr, reverse=True)
        )
