"""SqlSession dispatches the reference's own SQL statements
(README.md:220-229, scripts/raw-bronze.py:113,
scripts/bronze-silver.py:213,254-269) onto the lakehouse catalog."""

import pytest
from pyspark.sql import types as T

from medallion_architecture_using_apache_iceberg_table_buckets_spark.lakehouse import (
    Catalog,
)

SCHEMA = T.StructType(
    [
        T.StructField("invoiceid", T.LongType()),
        T.StructField("category", T.StringType()),
        T.StructField("processed_time", T.LongType()),
    ]
)


@pytest.fixture()
def sess(spark, tmp_path):
    cat = Catalog(tmp_path / "wh")
    return cat.sql_session(spark)


def test_reference_namespace_statements_verbatim(spark, sess):
    # scripts/raw-bronze.py:113 and README.md:220-222, catalog prefix
    # and all
    sess.sql("CREATE NAMESPACE IF NOT EXISTS s3tablesbucket.example_namespace")
    ns = [r["namespace"] for r in sess.sql("SHOW NAMESPACES IN s3tablesbucket").collect()]
    assert ns == ["example_namespace"]
    sess.sql("USE s3tablesbucket.example_namespace")
    assert sess.sql("SHOW TABLES").collect() == []

    sess.catalog.create_table("example_namespace", "bronze_orders", SCHEMA)
    tables = sess.sql("SHOW TABLES").collect()
    assert [(r["namespace"], r["tableName"]) for r in tables] == [
        ("example_namespace", "bronze_orders")
    ]


def test_reference_selects_and_counts(spark, sess):
    sess.sql("CREATE NAMESPACE IF NOT EXISTS example_namespace")
    sess.sql("USE example_namespace")
    t = sess.catalog.create_table("example_namespace", "bronze_orders", SCHEMA)
    t.append(
        spark.createDataFrame(
            [(1, "Office", 10), (2, "Books", 20)], SCHEMA
        )
    )
    # README.md:224-228, bare table names after USE
    assert sess.sql("SELECT count(*) FROM bronze_orders ").collect()[0][0] == 2
    rows = sess.sql("SELECT invoiceid,category FROM bronze_orders ").collect()
    assert {(r["invoiceid"], r["category"]) for r in rows} == {
        (1, "Office"),
        (2, "Books"),
    }


def test_reference_merge_template(spark, sess):
    """The bronze->silver MERGE text (scripts/bronze-silver.py:254-269)
    with the standard ON / WHEN completion, executed as-written via a
    __temp_table temp view."""
    sess.sql("CREATE NAMESPACE IF NOT EXISTS example_namespace")
    sess.sql("USE example_namespace")
    t = sess.catalog.create_table("example_namespace", "silver_orders", SCHEMA)
    t.append(spark.createDataFrame([(1, "Old", 1), (3, "Keep", 1)], SCHEMA))

    spark.createDataFrame(
        [(1, "New", 5), (1, "Newer", 9), (2, "Insert", 7)], SCHEMA
    ).createOrReplaceTempView("__temp_table")

    merge_query = """
MERGE INTO {full_table_name} AS target
USING (
    SELECT *
    FROM (
        SELECT *,
               ROW_NUMBER() OVER (
                   PARTITION BY invoiceid
                   ORDER BY processed_time DESC
               ) AS row_num
        FROM __temp_table
    ) AS deduped_source
    WHERE row_num = 1
) AS source
ON target.invoiceid = source.invoiceid
WHEN MATCHED THEN UPDATE SET *
WHEN NOT MATCHED THEN INSERT *
"""
    sess.sql(merge_query.format(full_table_name="silver_orders"))
    spark.catalog.dropTempView("__temp_table")

    got = {r["invoiceid"]: r["category"] for r in t.read(spark).collect()}
    assert got == {1: "Newer", 2: "Insert", 3: "Keep"}


def test_merge_with_cdc_delete_clause(spark, sess):
    sess.sql("CREATE NAMESPACE IF NOT EXISTS ns")
    sess.sql("USE ns")
    schema = T.StructType(
        SCHEMA.fields + [T.StructField("Op", T.StringType())]
    )
    t = sess.catalog.create_table("ns", "orders", SCHEMA)
    t.append(spark.createDataFrame([(1, "A", 1), (2, "B", 1)], SCHEMA))
    spark.createDataFrame(
        [(1, "A2", 5, "U"), (2, "B", 5, "D"), (4, "D4", 5, "I")], schema
    ).createOrReplaceTempView("__temp_table")
    sess.sql(
        """
        MERGE INTO orders AS target
        USING __temp_table AS source
        ON target.invoiceid = source.invoiceid
        WHEN MATCHED AND source.Op = 'D' THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """
    )
    got = {r["invoiceid"]: r["category"] for r in t.read(spark).collect()}
    assert got == {1: "A2", 4: "D4"}


def test_drop_statements_and_errors(spark, sess):
    sess.sql("CREATE NAMESPACE IF NOT EXISTS ns")
    sess.sql("USE ns")
    sess.catalog.create_table("ns", "t1", SCHEMA)
    sess.sql("DROP TABLE ns.t1")
    assert sess.sql("SHOW TABLES").collect() == []
    with pytest.raises(ValueError, match="does not exist"):
        sess.sql("DROP TABLE ns.t1")
    sess.sql("DROP TABLE IF EXISTS ns.t1")
    with pytest.raises(ValueError, match="does not exist"):
        sess.sql("USE nope")
    with pytest.raises(ValueError, match="equi-key"):
        sess.catalog.create_table("ns", "t2", SCHEMA)
        sess.sql(
            "MERGE INTO t2 AS t USING t2 AS s ON t.invoiceid < s.invoiceid "
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
        )


def test_row_level_insert_update_delete(spark, sess):
    sess.sql("CREATE NAMESPACE IF NOT EXISTS ns")
    sess.sql("USE ns")
    t = sess.catalog.create_table("ns", "orders", SCHEMA)
    sess.sql(
        "INSERT INTO orders VALUES (1, 'Office', 10), (2, 'Books', 20), "
        "(3, 'Games', 30)"
    )
    assert t.read(spark).count() == 3
    sess.sql(
        "UPDATE orders SET category = concat(category, '!'), "
        "processed_time = processed_time + 1 WHERE invoiceid = 2"
    )
    got = {r["invoiceid"]: (r["category"], r["processed_time"])
           for r in t.read(spark).collect()}
    assert got[2] == ("Books!", 21)
    assert got[1] == ("Office", 10)  # untouched
    sess.sql("DELETE FROM orders WHERE invoiceid = 1")
    assert {r["invoiceid"] for r in t.read(spark).collect()} == {2, 3}
    # file-scoped: the delete rewrote only touched files
    snap = t.current_snapshot()
    assert snap.operation == "delete"
    # INSERT ... SELECT over attached views
    sess.sql(
        "INSERT INTO orders SELECT invoiceid + 100, category, "
        "processed_time FROM orders"
    )
    assert t.read(spark).count() == 4


def test_create_table_statement(spark, sess):
    sess.sql("CREATE NAMESPACE IF NOT EXISTS ns")
    sess.sql("USE ns")
    sess.sql(
        """
        CREATE TABLE ns.silver_orders (
            invoiceid BIGINT NOT NULL,
            category STRING,
            price DECIMAL(10,2),
            orderdate DATE
        ) USING iceberg
        PARTITIONED BY (category)
        TBLPROPERTIES ('write.merge.mode' = 'copy-on-write', 'fmt' = '2')
        """
    )
    t = sess.catalog.table("ns", "silver_orders")
    assert [f.name for f in t.schema.fields] == [
        "invoiceid", "category", "price", "orderdate"
    ]
    assert t.schema.fields[0].nullable is False
    assert t.partition_by == ["category"]
    assert t.properties["write.merge.mode"] == "copy-on-write"
    # IF NOT EXISTS is a no-op; without it, an error
    sess.sql("CREATE TABLE IF NOT EXISTS silver_orders (x INT)")
    with pytest.raises(ValueError, match="already exists"):
        sess.sql("CREATE TABLE silver_orders (x INT)")
    # created table is immediately usable through the dispatcher
    sess.sql(
        "INSERT INTO silver_orders VALUES "
        "(1, 'Office', 9.99, DATE '2024-01-01')"
    )
    assert sess.sql("SELECT count(*) FROM silver_orders").collect()[0][0] == 1
