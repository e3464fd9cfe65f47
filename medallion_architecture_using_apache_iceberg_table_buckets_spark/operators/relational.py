"""Core relational query surface (SURVEY.md §2) on the test tables.

Every function takes ``(spark, sf_dir)`` and returns a DataFrame;
each has a DuckDB oracle twin in ``__spark_entry__.oracle_sql``.

Determinism rules shared with the oracles:
- monetary aggregates are summed as DECIMAL(18,4) (exact, order-
  insensitive) then cast to double and rounded — never raw
  double-sum, whose value depends on partial-aggregation order;
- every top-k query orders by a rounded measure plus a unique key so
  both engines select the identical row set;
- all computed columns are aliased identically in Spark and SQL.

Scale notes are on each operator; the common ones: filters/projects
push into the Parquet scan, small dimensions are broadcast, windows
shuffle once on their partition key, and no operator collects row
data to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table. The events table stores TIMESTAMP(NANOS),
    which Spark's vectorized Parquet reader rejects by default —
    read it as long nanos and convert to a microsecond timestamp
    (matching DuckDB's value semantics)."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Newer Spark builds read TIMESTAMP(NANOS) natively as
            # TIMESTAMP_NTZ (the legacy nanosAsLong conf is ignored).
            # The session runs in UTC, so casting to the LTZ timestamp
            # type is value-preserving and keeps downstream epoch
            # arithmetic (cast to bigint) legal.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec(col):
    """Exact summation element: double -> DECIMAL(18,4)."""
    return F.col(col).cast("decimal(18,4)") if isinstance(col, str) else col.cast("decimal(18,4)")


def _money(sum_col, scale: int = 2):
    return F.round(sum_col.cast("double"), scale)


def _revenue():
    """extendedprice * (1 - discount), computed decimal-first.

    Inputs are 2-decimal money values; casting each factor to a narrow
    decimal BEFORE multiplying keeps the product exact (DECIMAL(18,4))
    in both Spark and DuckDB. Casting the double *product* instead
    rounds per-row, where the engines can disagree on near-ties
    (Spark HALF_UP on shortest-repr vs DuckDB scaled-double).
    Oracle twin: ``__spark_entry__._REV``.
    """
    ext = F.col("l_extendedprice").cast("decimal(12,2)")
    one = F.lit(1).cast("decimal(2,0)")
    return ext * (one - F.col("l_discount").cast("decimal(4,2)"))


# ----------------------------------------------------------------------
# §2.1/§2.2 — scans, projections, filters
# ----------------------------------------------------------------------

def s1_scan_filter_project(spark, sf_dir):
    """S1+P2+P4: pruned scan with pushed-down predicate.

    The plan must show PushedFilters + a 3-column ReadSchema — at
    100 TB this is the difference between reading 3 columns and 11.
    """
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450_000.0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


def f3_derive_partition_date(spark, sf_dir):
    """F3 + date scalar functions: the bronze partition-date derivation
    (string yyyy-MM-dd, reference scripts/raw-bronze.py:215) plus
    calendar parts."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.quarter("o_orderdate").cast("int").alias("order_quarter"),
        F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
    )


def a1_count_star(spark, sf_dir):
    """A1: global COUNT(*) (reference README.md:224-225)."""
    return load(spark, sf_dir, "lineitem").agg(F.count("*").alias("cnt"))


# ----------------------------------------------------------------------
# §2.5/§2.6 — windows, top-k
# ----------------------------------------------------------------------

def w1_latest_per_key(spark, sf_dir):
    """W1: keep-latest-per-key dedup (reference
    scripts/bronze-silver.py:258-266) on the events stream; one
    shuffle on user_id, deterministic (ts, event_id) tie-break."""
    from .window_ops import keep_latest_per_key

    e = load(spark, sf_dir, "events")
    return keep_latest_per_key(e, ["user_id"], ["ts", "event_id"]).select(
        "user_id", "event_id", "event_type", "value", "ts"
    )


def o1_topk_latest(spark, sf_dir):
    """O1: ORDER BY ts DESC LIMIT k — Catalyst plans TakeOrderedAndProject
    (per-partition top-k + merge), never a full sort."""
    e = load(spark, sf_dir, "events")
    return (
        e.orderBy(F.desc("ts"), F.desc("event_id"))
        .select("event_id", "user_id", "event_type", "ts")
        .limit(10)
    )


def window_running_totals(spark, sf_dir):
    """Analytic windows: running count/sum, lag, rank per customer."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wrank = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("order_seq"),
        _money(F.sum(_dec("o_totalprice")).over(cum)).alias("running_spend"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.rank().over(wrank).alias("spend_rank"),
    )


# ----------------------------------------------------------------------
# §2.3/§2.4 — joins and aggregations
# ----------------------------------------------------------------------

def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: wide scan, partial+final hash agg, tiny result.

    Determinism: money inputs are 2-decimal values, so each factor is
    cast to a narrow decimal BEFORE multiplying — the products
    (DECIMAL(18,4) / DECIMAL(24,6)) stay exact in both Spark and
    DuckDB, and the sums are order-insensitive. Casting the *product*
    of doubles instead puts a double->decimal rounding on every row,
    where Spark (HALF_UP on shortest-repr) and DuckDB (scaled-double
    nearest-even) can disagree by 0.0001 per row.
    """
    l = load(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(2,0)")
    one_plus_tax = one + F.col("l_tax").cast("decimal(4,2)")
    disc_price = _revenue()
    charge = _revenue() * one_plus_tax
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money(F.sum(_dec("l_quantity"))).alias("sum_qty"),
            _money(F.sum(_dec("l_extendedprice"))).alias("sum_base_price"),
            _money(F.sum(disc_price)).alias("sum_disc_price"),
            _money(F.sum(charge)).alias("sum_charge"),
            F.round(F.sum(_dec("l_quantity")).cast("double") / F.count("*"), 4).alias("avg_qty"),
            F.round(F.sum(_dec("l_extendedprice")).cast("double") / F.count("*"), 4).alias("avg_price"),
            F.round(F.sum(_dec("l_discount")).cast("double") / F.count("*"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter -> join -> agg -> top-k.
    Revenue ordered on the rounded value + key for a deterministic
    top-10 across engines."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    revenue = _revenue()
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_money(F.sum(revenue)).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q5_region_revenue(spark, sf_dir):
    """TPC-H Q5 shape: two tiny dims (region, nation) broadcast into a
    6-way join; revenue per nation."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    revenue = _revenue()
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .filter(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_money(F.sum(revenue)).alias("revenue"))
    )


def join_semi_big_spenders(spark, sf_dir):
    """Left-semi join: customers with at least one 450k+ order."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450_000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def join_anti_never_ordered(spark, sf_dir):
    """Left-anti join: customers with no orders at all."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def join_broadcast_brand_stats(spark, sf_dir):
    """Explicit broadcast of the part dimension into the lineitem fact
    (the 100 TB-correct plan: no shuffle of the big side)."""
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            _money(F.sum(_dec("l_extendedprice"))).alias("brand_revenue"),
        )
    )


def agg_rollup_orders(spark, sf_dir):
    """ROLLUP(status, priority) with grand total; NULL group keys
    coalesced to 'ALL' so both engines emit identical rows."""
    o = load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            _money(F.sum(_dec("o_totalprice"))).alias("total_spend"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_spend",
        )
    )


def agg_distinct_customers(spark, sf_dir):
    """COUNT(DISTINCT) + min/max per group (two-phase distinct agg)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("uniq_customers"),
        F.count("*").alias("n_orders"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


# ----------------------------------------------------------------------
# §2.7 — set operations
# ----------------------------------------------------------------------

def set_union_segments(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    return a.union(b).distinct()


def set_intersect_building_buyers(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    buyers = o.filter(F.col("o_totalprice") > 400_000.0).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return building.intersect(buyers)


def set_except_nonbuyers(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.select("c_custkey").exceptAll(
        o.select(F.col("o_custkey").alias("c_custkey"))
    ).distinct()


# ----------------------------------------------------------------------
# scalar functions / JSON / calendar windows
# ----------------------------------------------------------------------

def scalar_string_math(spark, sf_dir):
    """String/math scalar surface — all JVM built-ins, zero UDFs."""
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%a%"))
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("bumped_price"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        F.when(F.col("p_size") > 25, "L")
        .when(F.col("p_size") > 10, "M")
        .otherwise("S")
        .alias("size_class"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
    )


def json_extract_events(spark, sf_dir):
    """JSON scalar extraction from the events props column."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    )


def events_daily_summary(spark, sf_dir):
    """Tumbling 1-day windows over the event stream, per type — the
    batch shape of a streaming windowed aggregation."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.to_date("ts").alias("day"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            _money(F.sum(_dec("value"))).alias("sum_value"),
        )
    )


def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: revenue between two nation pairs per year —
    multi-way join with a disjunctive pair predicate + year extract."""
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    revenue = _revenue()
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
        )
        .agg(_money(F.sum(revenue)).alias("revenue"))
    )


def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: top 20 customers by revenue lost to returns in
    a date window."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    revenue = _revenue()
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_money(F.sum(revenue)).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: HAVING filter + IN-subquery (orders whose
    total quantity exceeds a threshold, with their customers)."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    c = load(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.round(F.sum(_dec("l_quantity")).cast("double"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 300.0)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "total_qty")
    )


def agg_cube_status_priority(spark, sf_dir):
    """CUBE: all grouping-set combinations of (status, priority)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
        )
    )


def agg_percentiles(spark, sf_dir):
    """Exact percentiles (median / p90) per order status — the exact
    `percentile` aggregate, not approx_percentile (oracle-matched)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 2).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 2).alias("p90_price"),
    )


def agg_collect_sorted(spark, sf_dir):
    """Array aggregation: deterministic (sorted) list per group.

    The contract surface serializes the array with array_join — the
    driver's canonicalizer hashes cells and can't hash Python lists
    (CORRECTNESS_r01: "unhashable type: 'list'"). The array-typed
    form is covered by pytest (tests/test_relational_extra.py).
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    return o.groupBy("o_custkey").agg(
        F.array_join(
            F.sort_array(F.collect_list("o_orderpriority")), ","
        ).alias("priorities"),
        F.count("*").alias("n_orders"),
    )


EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def pivot_event_counts(spark, sf_dir):
    """PIVOT: one count column per event type, fixed category list
    (explicit values keep the output schema static — required for
    both determinism and sane planning on wide pivots)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .count()
        .na.fill(0, EVENT_TYPES)
    )


def window_moving_avg(spark, sf_dir):
    """7-day moving average over the daily event value series."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        _money(F.sum(_dec("value"))).alias("day_value")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    return daily.select(
        "day",
        "event_type",
        "day_value",
        F.round(F.avg("day_value").over(w), 4).alias("ma7"),
    )


def join_full_outer_spend(spark, sf_dir):
    """FULL OUTER join: every customer and every order bucket, null
    sides preserved."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100).select(
        "c_custkey", "c_name"
    )
    spend = (
        load(spark, sf_dir, "orders")
        .filter((F.col("o_custkey") >= 50) & (F.col("o_custkey") <= 150))
        .groupBy(F.col("o_custkey"))
        .agg(_money(F.sum(_dec("o_totalprice"))).alias("spend"))
    )
    return c.join(spend, c.c_custkey == spend.o_custkey, "full_outer").select(
        "c_custkey", "c_name", "o_custkey", "spend"
    )


def subquery_max_order(spark, sf_dir):
    """Correlated scalar subquery (Catalyst decorrelates to a join)."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               (SELECT round(max(o_totalprice), 2) FROM v_orders o
                WHERE o.o_custkey = c.c_custkey) AS max_order
        FROM v_customer c WHERE c_custkey <= 200
        """
    )


def catalog_history_metadata(spark, sf_dir):
    """D2-D8 + S8: namespace/table DDL and the history metadata table,
    driven through the real catalog; output is the deterministic
    (snapshot_id, parent_id, operation, is_current_ancestor) sequence
    for a create+append+append+merge lifecycle."""
    import tempfile

    from ..lakehouse import Catalog, merge_into

    cat = Catalog(tempfile.mkdtemp(prefix="mats_meta_"))
    cat.create_namespace("meta_demo")
    assert "meta_demo" in cat.namespaces()  # D3 SHOW NAMESPACES
    n = load(spark, sf_dir, "nation")
    t = cat.create_table("meta_demo", "nations", n.schema)
    t.append(n.filter(F.col("n_nationkey") < 10))
    t.append(n.filter(F.col("n_nationkey") >= 10))
    merge_into(spark, t, n.limit(5), on="n_nationkey")
    assert cat.table_exists("meta_demo", "nations")  # D6
    hist = t.history_df(spark)  # S8 metadata table
    ops = t.snapshots_df(spark).select("snapshot_id", "operation")
    return (
        hist.join(ops, "snapshot_id")
        .select("snapshot_id", "parent_id", "operation", "is_current_ancestor")
        .orderBy("snapshot_id")
    )


# ----------------------------------------------------------------------
# as-of join (operator the reference lacks; SURVEY.md §2.3)
# ----------------------------------------------------------------------

def asof_click_purchase(spark, sf_dir):
    """For every click, the user's latest purchase at-or-before the
    click. Union + window forward-fill: one shuffle, no range join."""
    from .window_ops import asof_join

    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    return asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="click_ts",
        right_ts="p_ts",
        right_payload=["purchase_id", "purchase_value"],
        right_order=["purchase_id"],
    )


def array_map_funcs(spark, sf_dir):
    """Complex-type scalar surface: array construct/index/contains/
    filter/transform and map construct/lookup — all higher-order
    built-ins, no UDFs."""
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    arr = F.array(F.col("event_id"), F.col("user_id"), F.col("event_id") + F.col("user_id"))
    return e.select(
        "event_id",
        F.element_at(arr, 3).alias("arr_third"),
        F.array_contains(arr, F.col("user_id")).alias("has_user"),
        F.size(F.filter(arr, lambda x: x % 2 == 0)).cast("int").alias("n_even"),
        F.element_at(
            F.transform(arr, lambda x: x * 2), 1
        ).alias("first_doubled"),
        F.element_at(
            F.create_map(F.lit("uid"), F.col("user_id"), F.lit("eid"), F.col("event_id")),
            "uid",
        ).alias("map_uid"),
        F.array_max(arr).alias("arr_max"),
        # serialized, not array-typed: the driver's canonicalizer
        # can't hash list cells (see agg_collect_sorted)
        F.array_join(
            F.sort_array(arr, asc=False).cast("array<string>"), ","
        ).alias("arr_sorted_desc"),
    )


def date_arithmetic(spark, sf_dir):
    """Date/interval scalar surface: diffs, offsets, truncation,
    extraction, last-day — cross-engine-deterministic calendar math."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.datediff(F.lit("2000-01-01").cast("date"), d).cast("int").alias("days_to_y2k"),
        F.date_add(d, 30).alias("due_date"),
        F.add_months(d, 3).alias("quarter_later"),
        F.last_day(d).alias("month_end"),
        F.trunc(d, "month").alias("month_start"),
        F.dayofyear(d).cast("int").alias("doy"),
        F.weekofyear(d).cast("int").alias("woy"),
    )


def sessionize_events(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity splits): the batch
    form of the classic stateful-streaming operator.

    session_id = running count of gap-breaks per user (lag + windowed
    sum — two window passes over one shuffle by user); output is one
    row per session with span and event count. The streaming
    equivalent (applyInPandasWithState) lives in
    streaming/sessionize.py; this batch form is the oracle-checked
    one.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gaps = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w) > 1800,
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    sess = gaps.select(
        "user_id", "ts", "event_id", F.sum("brk").over(cum).alias("session_id")
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


# ----------------------------------------------------------------------
# medallion CDC current-state via the real lakehouse MERGE machinery
# ----------------------------------------------------------------------

def medallion_merge_state(spark, sf_dir):
    """J1 end-to-end: build a bronze/silver pair from the events table
    through the actual lakehouse MERGE INTO path, return silver.

    Batch 1 = first half of the month (create + merge), batch 2 =
    second half (upsert). The result is provably the global
    latest-event-per-user — which is what the oracle asserts.
    """
    import tempfile

    from ..lakehouse import Catalog, merge_into
    from .window_ops import keep_latest_per_key

    e = load(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    batch1 = e.filter(F.col("ts") < cut)
    batch2 = e.filter(F.col("ts") >= cut)

    cat = Catalog(tempfile.mkdtemp(prefix="mats_merge_"))
    t = cat.create_table("demo", "user_state", e.schema, partition_by=())
    for batch in (batch1, batch2):
        src = keep_latest_per_key(batch, ["user_id"], ["ts", "event_id"])
        merge_into(spark, t, src, on="user_id")
    return t.read(spark).select("user_id", "event_id", "event_type", "value", "ts")


# ----------------------------------------------------------------------
# TPC-H shape sweep (round 3): EXISTS / NOT EXISTS, disjunctive join
# predicates, scalar-threshold subqueries, outer-join distributions.
# The test tables carry a trimmed TPC-H schema (no l_commitdate /
# l_receiptdate / l_shipmode / c_phone / partsupp), so each query keeps
# the original's OPERATOR pattern with equivalent predicates over the
# columns that exist.
# ----------------------------------------------------------------------

def q4_priority_late_exists(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS correlated subquery -> left-semi join.

    Orders from 1996-H2 counted per priority when at least one of
    their lines shipped >90 days after the order date ("late", the
    stand-in for the missing commit/receipt pair).

    Scale: the date filter pushes into the orders scan; the semi-join
    never duplicates the probe side (no distinct needed), and both
    sides hash-shuffle once on orderkey. The non-equi lateness
    condition rides along as the semi-join residual.
    """
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey)
            & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: single-table selective filter + global agg.

    The whole query is one scan with every predicate pushed down and
    a two-column ReadSchema beyond the filters — the canonical "does
    pushdown work" probe. Revenue term extendedprice*discount is
    decimal-exact (2dp x 2dp factors), so the global sum is
    order-insensitive.
    """
    l = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * F.col(
        "l_discount"
    ).cast("decimal(4,2)")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(_money(F.sum(rev)).alias("revenue"))
    )


def q12_late_lines_by_status(spark, sf_dir):
    """TPC-H Q12 shape: fact-fact equi-join + CASE-WHEN conditional
    aggregation (late 1996 lines split into high/low order priority
    per line status).

    Scale: both facts shuffle once on orderkey; the conditional
    counts are algebraic (map-side partial agg), and the final
    groupBy key (l_linestatus) is tiny.
    """
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q13_customer_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape: left-outer join + two-level aggregation
    (orders-per-customer histogram, never-ordered customers kept as
    count 0).

    Scale: the priority filter applies to the orders side BEFORE the
    outer join (filter-below-outer-join is only legal on the
    preserved side's opposite — Catalyst can't push it out of a WHERE
    without changing semantics, so it is placed there explicitly).
    Both aggregations are algebraic; the second one's key space is
    tiny (distinct order counts).
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q14_promo_revenue_share(spark, sf_dir):
    """TPC-H Q14 shape: fact->dim broadcast join + global conditional
    ratio (share of March-1996 revenue from PROMO parts).

    Determinism: both the promo and total sums are exact decimals;
    the single ratio is computed double-from-decimal at the very end
    with an identical expression tree in the oracle.
    """
    p = load(spark, sf_dir, "part")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = _revenue()
    zero = F.lit(0).cast("decimal(18,4)")
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
    total = F.sum(rev)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0) * promo.cast("double") / total.cast("double"), 4
            ).alias("promo_pct")
        )
    )


def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: per-group scalar AVG subquery joined back to
    the fact (brand parts whose line quantity is below 20% of that
    part's average quantity; yearly-revenue estimate sum/7).

    The correlated `avg(l_quantity)` is algebraized: per-part
    (sum, count) aggregate, broadcast back, and the threshold
    l_quantity < 0.2*avg is compared WITHOUT division as
    5*quantity*count < sum in exact decimals — no double rounding at
    the boundary in either engine.

    Scale: parts filter broadcast into the fact scan; the per-part
    stats table is |filtered parts| rows — broadcast on the way back.
    One shuffle total (the per-part aggregation).
    """
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 10)
    )
    l = load(spark, sf_dir, "lineitem")
    lp = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    stats = lp.groupBy("p_partkey").agg(
        F.sum(_dec("l_quantity")).alias("qty_sum"),
        F.count("*").alias("qty_n"),
    ).withColumnRenamed("p_partkey", "sp_partkey")
    return (
        lp.join(F.broadcast(stats), lp.p_partkey == stats.sp_partkey)
        .filter(
            _dec("l_quantity") * F.lit(5) * F.col("qty_n") < F.col("qty_sum")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast(
                    "double"
                )
                / F.lit(7.0),
                2,
            ).alias("avg_yearly")
        )
    )


def q19_disjunctive_predicates(spark, sf_dir):
    """TPC-H Q19 shape: equi-join with an OR-of-ANDs residual.

    Catalyst must extract the common l_partkey = p_partkey
    conjunct from the disjunction so the join stays a hash join with
    the brand/size/quantity triplets as a post-join residual filter —
    the naive reading is a nested-loop over the full cross product.
    (tests/test_plans.py pins the no-nested-loop shape.)
    """
    p = load(spark, sf_dir, "part")
    l = load(spark, sf_dir, "lineitem")
    joined = l.join(p, l.l_partkey == p.p_partkey)
    case = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(case).agg(_money(F.sum(_revenue())).alias("revenue"))


def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape: EXISTS + NOT EXISTS double-correlated pattern.

    For one nation's suppliers: count 'F'-status orders where this
    supplier's line shipped late (>90 days after order date), the
    order involves at least one OTHER supplier (EXISTS -> left-semi),
    and no other supplier's line was late (NOT EXISTS -> left-anti).

    Scale: `late` is computed once and reused for both the driving
    rows and the NOT EXISTS side; semi/anti joins shuffle on
    orderkey with the suppkey-inequality as residual; the supplier x
    nation side is broadcast.
    """
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = l.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    )
    l3 = late.select(
        F.col("l_orderkey").alias("o3_orderkey"),
        F.col("l_suppkey").alias("o3_suppkey"),
    )
    waiting = (
        late.join(F.broadcast(s), late.l_suppkey == s.s_suppkey)
        .join(
            l2,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


def q22_dormant_customers(spark, sf_dir):
    """TPC-H Q22 shape: global scalar AVG threshold + anti join
    (above-average-balance customers in three segments with no order
    since 2000, per segment — every test customer has SOME order, so
    "dormant since" stands in for the original's never-ordered).

    The `c_acctbal > avg(...)` comparison is division-free:
    acctbal*count > sum in exact decimals, so the boundary rows agree
    bit-for-bit with the oracle. The 1-row threshold aggregate is
    broadcast; dormancy is a left-anti join on custkey against the
    date-filtered (scan-pushed) orders side.
    """
    segs = ("AUTOMOBILE", "HOUSEHOLD", "MACHINERY")
    pool = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment").isin(*segs))
    thresh = pool.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(_dec("c_acctbal")).alias("bal_tot"),
        F.count("*").alias("bal_n"),
    )
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        pool.crossJoin(F.broadcast(thresh))
        .filter(_dec("c_acctbal") * F.col("bal_n") > F.col("bal_tot"))
        .join(o, pool.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            _money(F.sum(_dec("c_acctbal"))).alias("totacctbal"),
        )
    )


def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: 8-way join (two roles for nation) feeding a
    per-year conditional ratio — the supplier-nation share of ECONOMY
    part volume sold into one region over two years.

    Scale: region/nation/part filters broadcast; the fact-side joins
    (lineitem-orders-customer) shuffle on their keys; the share ratio
    divides two exact decimal sums per year at the very end. The two
    nation roles join independently (customer's nation gates region
    membership, supplier's nation labels the share) — aliased scans,
    both broadcast.
    """
    n1 = load(spark, sf_dir, "nation").alias("n1")
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    vol = _revenue()
    zero = F.lit(0).cast("decimal(18,4)")
    share_vol = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(zero)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(r), F.col("n1.n_regionkey") == r.r_regionkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_nationkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(share_vol).cast("double") / F.sum(vol).cast("double"), 4
            ).alias("mkt_share")
        )
    )


def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: aggregate 'view' + scalar MAX subquery —
    suppliers whose half-year revenue equals the global maximum.

    The revenue relation is computed once and reused for both the
    candidates and the maximum (a 1-row aggregate broadcast back);
    equality compares the same rounded double on both sides, so the
    tie set is identical across engines. Two shuffles total: the
    per-supplier aggregation and nothing else wide (max + final joins
    are broadcast).
    """
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    s = load(spark, sf_dir, "supplier")
    revenue = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_money(F.sum(_revenue())).alias("total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def window_rank_functions(spark, sf_dir):
    """Distribution-rank window family: ntile quartiles, percent_rank,
    cume_dist, dense_rank over per-status order spend.

    All four share one window (single hash-shuffle on o_orderstatus);
    the order key includes the unique o_orderkey so tie rows get
    identical ranks in both engines. percent_rank/cume_dist are exact
    rational values of row positions — doubles agree bit-for-bit.
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 300)
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderstatus",
        "o_orderkey",
        F.ntile(4).over(w).alias("spend_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.dense_rank().over(w).alias("drank"),
    )


def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (beyond rollup/cube): per-status,
    per-priority, and grand-total rows in one aggregation pass —
    Spark expands the sets into a single Expand + hash aggregate, so
    the fact table is scanned once however many sets are requested.
    """
    o = load(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count("*").alias("n_orders"),
        _money(F.sum(_dec("o_totalprice"))).alias("total_spend"),
    )

# ----------------------------------------------------------------------
# TPC-H completion: q2 / q9 / q11 / q16 / q20 shapes.
#
# The testdata has no partsupp table, so the part-supplier relation is
# DERIVED from lineitem: supply cost for a (part, supplier) pair is the
# cheapest extended price ever quoted for it. min() does no arithmetic
# — the result is one of the original 2-decimal values, so the same
# decimal casts the other money queries rely on stay exact here.
# ----------------------------------------------------------------------

def _derived_partsupp(spark, sf_dir):
    """partsupp stand-in: one row per (part, supplier) pair seen in
    lineitem with the minimum quoted extendedprice as ps_supplycost.

    Scale: one hash shuffle on the composite key; the result is
    ~|distinct pairs|, far smaller than lineitem, and every consumer
    below joins it on the same (partkey, suppkey) key so AQE can reuse
    the exchange."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(F.min("l_extendedprice").alias("ps_supplycost"))


def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: per-part minimum-cost supplier within one
    region — a correlated MIN subquery decorrelated into a grouped
    aggregate joined back on the part key.

    Scale: region/nation/part are broadcast; the derived partsupp
    shuffles once on (part, supp), then the per-part MIN is a window
    over ps_partkey — ONE pass over the eligible relation (a grouped
    min joined back would scan and join it twice). The equality
    filter compares the identical double (min picks a member value,
    no arithmetic), so the tie set is engine-stable. Top-100 is
    ordered on a total key (acctbal, nation, supplier, part, supp)
    so both engines cut the same rows.
    """
    ps = _derived_partsupp(spark, sf_dir)
    p = load(spark, sf_dir, "part").filter(F.col("p_size") == 25).select(
        "p_partkey", "p_brand"
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    elig = (
        ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("ps_partkey", "ps_suppkey", "ps_supplycost",
                "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
    )
    w = Window.partitionBy("ps_partkey")
    return (
        elig.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
                "ps_suppkey", "ps_supplycost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey",
                 "ps_suppkey")
        .limit(100)
    )


def q9_product_type_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit by supplier nation and order year —
    revenue minus derived supply cost times quantity, over parts whose
    name matches a pattern.

    Scale: the part filter broadcasts; the partsupp self-aggregate
    joins lineitem on its composite key; orders joins on l_orderkey;
    nation broadcasts. Profit terms are decimal-exact per row
    (supplycost is an original 2-dec value, quantity integer-valued),
    so the final sums are order-insensitive.
    """
    ps = _derived_partsupp(spark, sf_dir)
    p = load(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    cost = F.col("ps_supplycost").cast("decimal(12,2)") * F.col(
        "l_quantity"
    ).cast("decimal(12,2)")
    amount = _revenue() - cost
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(ps, (l.l_partkey == ps.ps_partkey) & (l.l_suppkey == ps.ps_suppkey))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(_money(F.sum(amount)).alias("sum_profit"))
    )


def q11_important_part_value(spark, sf_dir):
    """TPC-H Q11 shape: per-part inventory value from one nation's
    suppliers, kept only when it exceeds a fixed fraction of the
    national total — a scalar aggregate broadcast back as a HAVING
    threshold.

    Scale: the value relation is computed once (one shuffle on
    l_partkey) and reused for both the per-part rows and the 1-row
    total (broadcast crossJoin, q15 pattern). The threshold compare
    happens on exact decimals — no double rounding at the cut line.
    """
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    s = load(spark, sf_dir, "supplier")
    l = load(spark, sf_dir, "lineitem")
    val = F.col("l_extendedprice").cast("decimal(12,2)") * F.col(
        "l_quantity"
    ).cast("decimal(12,2)")
    per_part = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("value_dec"))
    )
    total = per_part.agg(F.sum("value_dec").alias("total_dec"))
    frac = F.lit("0.001").cast("decimal(4,3)")
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec") > F.col("total_dec") * frac)
        .select("l_partkey", _money(F.col("value_dec")).alias("part_value"))
    )


def q16_parts_supplier_counts(spark, sf_dir):
    """TPC-H Q16 shape: distinct suppliers per (brand, type, size)
    over selected part classes, excluding a supplier denylist via
    NOT IN — planned as a broadcast anti-join, never a filter scan.

    Scale: part and the denylist broadcast; count(DISTINCT) expands
    to a two-phase aggregate on (brand, type, size, suppkey) then
    (brand, type, size) — both key-local shuffles.
    """
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 1000.0
    ).select(F.col("s_suppkey").alias("bad_suppkey"))
    l = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), l.l_suppkey == F.col("bad_suppkey"),
              "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q20_promotable_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: nested semi-join — suppliers in one nation
    who, for some tracked part, shipped more than half their lifetime
    quantity of it during 1997.

    Scale: the tracked-part filter broadcasts into lineitem; the
    per-(part, supplier) conditional sums are one composite-key
    shuffle; the qualifying supplier keys semi-join back into the
    supplier dimension (no row multiplication). The half threshold is
    compared as 2*qty97 > total on exact decimals.
    """
    p = load(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_19")
    s = load(spark, sf_dir, "supplier")
    l = load(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    zero = F.lit(0).cast("decimal(12,2)")
    pairs = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.when(F.year("l_shipdate") == 1997, qty).otherwise(zero)).alias("qty97"),
            F.sum(qty).alias("qty_total"),
        )
        .filter(F.col("qty97") * F.lit(2).cast("decimal(2,0)") > F.col("qty_total"))
        .select("l_suppkey")
    )
    return (
        s.join(pairs, s.s_suppkey == pairs.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "s_acctbal")
    )


def range_join_event_windows(spark, sf_dir):
    """KEYLESS interval join (interval.range_join_points with no equi
    keys — the path range_join_incidents' keyed query never touches):
    every 97th event anchors a ±30-minute incident window; every event
    landing inside a window (pure range containment, no shared key)
    is counted into it. Written naively this is a cross product —
    the bucket-expansion rewrite joins on the derived 30-minute epoch
    bucket ALONE (intervals replicate into ~3 buckets each, points
    into exactly one, so each pair appears once) and the plan is an
    ordinary shuffle join; the plan test pins the absence of
    BroadcastNestedLoopJoin/CartesianProduct."""
    from .interval import range_join_points

    e = load(spark, sf_dir, "events")
    anchors = e.filter(F.col("event_id") % 97 == 0).select(
        F.col("event_id").alias("window_id"),
        (F.col("ts") - F.expr("INTERVAL 30 MINUTES")).alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("w_end"),
    )
    pts = e.select("event_id", "user_id", "ts")
    j = range_join_points(
        pts, anchors, "ts", "w_start", "w_end", keys=None, bucket_width_s=1800
    )
    return j.groupBy("window_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
    )


def table_quality_checks(spark, sf_dir):
    """Declarative data-quality verification (operators/quality.py —
    the Deequ/dbt-test surface): four row predicates fused into ONE
    aggregation scan per table, a primary-key uniqueness check (one
    key-local shuffle), and a lineitem→orders referential check (one
    anti-join). Violations are planted deterministically (negated
    quantities on l_orderkey%1009, orphaned keys on %997, duplicated
    orders below key 100, nulled custkeys on %501) so every check
    kind reports a non-zero, oracle-verified count."""
    from .quality import (
        constraint_report,
        fk_violations,
        row_violations,
        unique_violations,
    )

    li = load(spark, sf_dir, "lineitem").withColumn(
        "l_quantity",
        F.when(
            F.col("l_orderkey") % 1009 == 0, -F.col("l_quantity")
        ).otherwise(F.col("l_quantity")),
    ).withColumn(
        "l_orderkey",
        F.when(
            F.col("l_orderkey") % 997 == 0,
            F.col("l_orderkey") + F.lit(1000000000),
        ).otherwise(F.col("l_orderkey")),
    )
    o = load(spark, sf_dir, "orders").withColumn(
        "o_custkey",
        F.when(
            F.col("o_orderkey") % 501 == 0, F.lit(None).cast("long")
        ).otherwise(F.col("o_custkey")),
    )
    ords = o.unionByName(o.filter(F.col("o_orderkey") < 100))

    li_rows = row_violations(
        li,
        {
            "lineitem_quantity_range": ~F.col("l_quantity").between(1, 50),
            "lineitem_discount_range": ~F.col("l_discount").between(
                0.0, 0.10
            ),
        },
    )
    o_rows = row_violations(
        ords,
        {
            "orders_custkey_not_null": F.col("o_custkey").isNull(),
            "orders_status_accepted": ~F.col("o_orderstatus").isin(
                "O", "F", "P"
            ),
        },
    )
    uniq = unique_violations(ords, ["o_orderkey"], "orders_pk_unique")
    fk = fk_violations(
        li, ["l_orderkey"], ords.select("o_orderkey"), ["o_orderkey"],
        "lineitem_orderkey_fk",
    )
    return constraint_report([li_rows, o_rows, uniq, fk]).withColumnRenamed(
        "check", "check_name"
    )


def events_funnel(spark, sf_dir):
    """Ordered-funnel analysis (view -> click -> purchase): per user,
    the earliest view, the earliest click STRICTLY AFTER it, and the
    earliest purchase strictly after that — the product-analytics
    primitive behind conversion reporting, where a click before the
    first view must NOT count.

    Plan (100 TB): a scan-local event_type filter keeps only the 3
    funnel stages, then three conditional-min aggregates chained by
    user_id equi-joins — every shuffle is on the user key (AQE reuses
    the partitioning), nothing collects, no per-user arrays that
    could blow memory on a power user with millions of events.
    """
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    ).filter(F.col("event_type").isin("view", "click", "purchase"))
    t1 = e.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    t2 = (
        e.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    t3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        t1.join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            (
                F.lit(1)
                + F.col("t_click").isNotNull().cast("int")
                + F.col("t_purchase").isNotNull().cast("int")
            ).alias("stage_reached"),
        )
        .orderBy("user_id")
    )


def events_cohort_retention(spark, sf_dir):
    """Cohort retention: users grouped by FIRST-ACTIVITY day, counted
    on each later day-offset they were active — the retention matrix
    behind every growth dashboard.

    Plan (100 TB): one distinct (user, activity-day) aggregate, one
    per-user min for the cohort day, a user-keyed equi-join, and the
    final (cohort, offset) count — all shuffles on user/cohort keys,
    output is cohort-days x offsets (tiny)."""
    e = load(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    active = e.distinct()
    cohort = active.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        active.join(cohort, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias(
                "day_offset"
            ),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


def events_attribution(spark, sf_dir):
    """Last-touch attribution: every purchase is credited to the
    user\'s LATEST click at-or-before it, but only within a 7-day
    lookback window — the standard marketing-attribution rule.
    Purchases with no qualifying click report in the unattributed
    bucket. Rolled up per attribution day: conversions and exact
    decimal revenue.

    Plan (100 TB): the as-of pairing is the union + per-user window
    forward-fill of window_ops.asof_join (ONE user-keyed shuffle, no
    range join, no per-user arrays), then the 7-day window is a
    map-side filter and the rollup is a bounded (day) hash-agg.
    """
    from .window_ops import asof_join

    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("value").alias("revenue"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    paired = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="p_ts",
        right_ts="c_ts",
        right_payload=["click_id", "c_ts"],
        right_order=["click_id"],
    )
    attributed = paired.select(
        "purchase_id",
        "revenue",
        F.when(
            F.col("c_ts").isNotNull()
            & (
                F.col("p_ts").cast("long") - F.col("c_ts").cast("long")
                <= 7 * 86400
            ),
            F.to_date("c_ts"),
        ).alias("attribution_day"),
    )
    return (
        attributed.groupBy("attribution_day")
        .agg(
            F.count("*").cast("long").alias("n_conversions"),
            F.round(
                F.sum(F.col("revenue").cast("decimal(18,4)")).cast(
                    "double"
                ),
                4,
            ).alias("attributed_revenue"),
        )
        .orderBy(F.col("attribution_day").asc_nulls_first())
    )


def events_funnel_latency(spark, sf_dir):
    """Conversion-latency distribution for the click -> purchase
    funnel step: per user, the earliest click and the earliest
    purchase strictly after it; report the converting-user count and
    the interpolated median / p90 of the latency in seconds — the
    "how long does conversion take" companion to events_funnel\'s
    "how many convert".

    Plan (100 TB): two conditional-min aggregates chained on the
    user key (exactly events_funnel\'s shuffle discipline), then one
    global percentile over the per-user latency scalars (one row per
    CONVERTING user — corpus-bounded, never per-event). Latencies
    are integer seconds, so the interpolated percentiles are exact
    halves/tenths and engine-deterministic."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    ).filter(F.col("event_type").isin("click", "purchase"))
    t1 = e.filter(F.col("event_type") == "click").groupBy("user_id").agg(
        F.min("ts").alias("t_click")
    )
    t2 = (
        e.filter(F.col("event_type") == "purchase")
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    lat = t1.join(t2, "user_id").select(
        (
            F.col("t_purchase").cast("long") - F.col("t_click").cast("long")
        ).alias("secs")
    )
    return lat.agg(
        F.count("*").cast("long").alias("n_converted"),
        F.round(F.percentile(F.col("secs"), F.lit(0.5)), 1).alias(
            "median_secs"
        ),
        F.round(F.percentile(F.col("secs"), F.lit(0.9)), 1).alias(
            "p90_secs"
        ),
    )


def events_user_ltv_deciles(spark, sf_dir):
    """User lifetime-value decile report: total purchase revenue per
    user, users cut into 10 equal-size buckets by rank over
    (revenue desc, user_id) — the deterministic total order makes
    the cut engine-exact — then per-decile user counts and exact
    decimal revenue. The classic "top decile drives X% of revenue"
    analytics cut. Semantics are exactly ``ntile(10) OVER (ORDER BY
    rev DESC, user_id)`` (the oracle's formulation), but the plan
    never funnels the user table through a single-partition window.

    Plan (100 TB): revenue is one user-keyed hash-agg. The global
    rank is then DISTRIBUTED: a range repartition on (rev desc,
    user_id) orders partitions end-to-end; per-partition row counts
    (at most spark.sql.shuffle.partitions rows — bounded planning
    metadata, never user-cardinality) turn into cumulative offsets
    via a tiny window; a broadcast join hands each user its
    partition offset, so global rank = offset + per-partition
    row_number. Every user-cardinality window below is PARTITIONED
    (by pid); the only unpartitioned window runs over the <=
    #shuffle-partitions count rows. ntile bucket math on (rank, n)
    reproduces the SQL ntile definition bit-exactly: with
    base = n div 10 and rem = n mod 10, the first rem buckets get
    base+1 rows. Both plan branches below share the same
    agg+range-exchange subplan, which Spark's ReuseExchange
    deduplicates."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    rev = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(18,4)")).alias("rev")
        )
    )
    # Range-partition by the total order, then stamp each row with its
    # physical partition id. spark_partition_id() is nondeterministic-
    # tagged, so Catalyst cannot push it through the exchange. The
    # partition count is EXPLICIT: a bare repartitionByRange would let
    # AQE coalesce each of the two consumers (offsets branch, rank
    # branch) independently, and a different coalescing would
    # desynchronize pid between them — an explicit count is preserved
    # verbatim by AQE, so both branches see identical pids.
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = rev.repartitionByRange(
        n_part, F.desc("rev"), F.asc("user_id")
    ).withColumn("pid", F.spark_partition_id())
    # Per-partition counts -> cumulative offsets + grand total. This
    # frame has at most one row per shuffle partition, so the
    # unpartitioned window here is bounded by cluster config, not by
    # data volume.
    w_prior = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = (
        ranged.groupBy("pid")
        .agg(F.count("*").alias("cnt"))
        .select(
            "pid",
            F.coalesce(F.sum("cnt").over(w_prior), F.lit(0)).alias("off"),
            F.sum("cnt").over(w_all).alias("n"),
        )
    )
    w_local = Window.partitionBy("pid").orderBy(
        F.desc("rev"), F.asc("user_id")
    )
    def _ceil_div(a, b):
        # Integer-exact ceil(a/b) for a >= 0, b >= 1: a % b is an
        # exact integer op, and dividing an exact multiple of b is
        # exactly rounded — no double-division boundary misrounds at
        # 2^50-scale ranks.
        q = ((a - (a % b)) / b).cast("long")
        return q + F.when((a % b) > 0, F.lit(1)).otherwise(F.lit(0))

    n_div = ((F.col("n") - (F.col("n") % 10)) / 10).cast("long")
    rem = F.col("n") % 10
    r = F.col("rank")
    # SQL ntile(10): first rem buckets hold n_div+1 rows each. When
    # n < 10 (n_div = 0) every rank lands in the first branch, so the
    # greatest() clamp in the second branch is only ANSI-safety.
    decile = F.when(
        r <= rem * (n_div + 1),
        _ceil_div(r, n_div + 1),
    ).otherwise(
        rem + _ceil_div(
            r - rem * (n_div + 1), F.greatest(n_div, F.lit(1))
        )
    )
    return (
        ranged.join(F.broadcast(offsets), "pid")
        .withColumn("rank", F.row_number().over(w_local) + F.col("off"))
        .withColumn("decile", decile)
        .groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.round(F.sum("rev").cast("double"), 4).alias("revenue"),
        )
        .orderBy("decile")
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_users", "revenue",
        )
    )


def events_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences (r10): each user's events ordered by (ts, event_id) —
    a deterministic total order, same tie-break rule as the funnel
    and attribution queries — yield (prev_type -> event_type) bigram
    counts and the row-normalized transition probability. The
    behavioral-sequence statistic behind next-event prediction and
    anomaly screens.

    Plan (100 TB): ONE user-keyed shuffle for the lag window (users
    are many and small — no skew pressure), then a bounded
    (prev_type, event_type) hash-agg with map-side combine; the
    normalizing window runs over the aggregated matrix itself —
    at most n_event_types^2 rows, bounded planning-scale metadata,
    never event-cardinality."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    t = seq.groupBy("prev_type", "event_type").agg(
        F.count("*").cast("long").alias("n_transitions")
    )
    norm = Window.partitionBy("prev_type")
    return t.select(
        "prev_type",
        "event_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(norm), 4
        ).alias("prob4"),
    )


def events_basket_lift(spark, sf_dir, min_item_support: int = 25,
                       min_pair_support: int = 3):
    """Market-basket association mining over lineitem: parts that
    co-occur in the same order, with support / confidence / lift —
    the A-priori-style pair pass behind "frequently bought together".

    Determinism: the floating association metrics are emitted as
    EXACT integer-arithmetic fixed-point values (parts-per-million,
    floor division on BIGINTs), so both engines compute identical
    cells with no double-rounding boundary; the raw integer counts
    ride alongside for auditability.

    Plan (100 TB): the A-priori downward-closure pushdown — a part
    must itself be frequent before any pair containing it can be —
    runs FIRST as one part-keyed hash-agg, and the surviving
    frequent-part list joins back BROADCAST, so the order-keyed pair
    self-join only ever sees frequent items. Pair fan-out per order
    is C(k,2) of its *frequent* line count — bounded by order size
    (TPC-H max 7 lines), never by corpus size. One shuffle on
    l_orderkey for the self-join, one bounded (part_a, part_b)
    hash-agg with map-side combine. The ppm math stays in BIGINT:
    1e6 * pair_cnt * n_orders fits 63 bits up to ~9e12
    pair-count*order products; at larger scale the same expressions
    promote to DECIMAL(38,0) unchanged."""
    li = load(spark, sf_dir, "lineitem")
    # distinct (order, part): a part twice in one order is one basket item
    op = li.select("l_orderkey", "l_partkey").dropDuplicates(
        ["l_orderkey", "l_partkey"]
    )
    freq = (
        op.groupBy("l_partkey")
        .agg(F.count("*").cast("long").alias("part_cnt"))
        .filter(F.col("part_cnt") >= min_item_support)
    )
    fop = op.join(F.broadcast(freq), "l_partkey").select(
        "l_orderkey", "l_partkey", "part_cnt"
    )
    a = fop.select(
        "l_orderkey",
        F.col("l_partkey").alias("part_a"),
        F.col("part_cnt").alias("cnt_a"),
    )
    b = fop.select(
        "l_orderkey",
        F.col("l_partkey").alias("part_b"),
        F.col("part_cnt").alias("cnt_b"),
    )
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(
            F.count("*").cast("long").alias("pair_cnt"),
            F.first("cnt_a").alias("cnt_a"),
            F.first("cnt_b").alias("cnt_b"),
        )
        .filter(F.col("pair_cnt") >= min_pair_support)
    )
    # Eager scalar count, embedded as an integer literal: the ppm
    # columns need the EXACT order total inside integer-div
    # expressions (a broadcast-scalar join would carry it as a column
    # but costs the same one aggregate job); one bounded COUNT
    # DISTINCT, planning metadata — same rationale as pagerank's
    # eager nodes.count().
    n_orders = op.select("l_orderkey").distinct().count()
    # ppm fixed-point via BIGINT `div` — exact integer floor division
    # on both engines (DuckDB's `//`), never floor-of-a-double
    return pairs.selectExpr(
        "part_a", "part_b", "pair_cnt", "cnt_a", "cnt_b",
        f"(1000000 * pair_cnt) div {n_orders} AS support_ppm",
        "(1000000 * pair_cnt) div cnt_a AS confidence_ppm",
        f"(1000000 * pair_cnt * {n_orders}) div (cnt_a * cnt_b)"
        " AS lift_ppm",
    )


def _distributed_ntile(df, n_buckets: int, order_cols, out_col: str):
    """Partition-safe ntile over a deterministic total order: the
    exact machinery of events_user_ltv_deciles' distributed-rank
    rewrite (see its docstring for the full rationale), factored so
    multi-metric scorecards (RFM) reuse it per dimension.

    Semantics are bit-exactly ``ntile(n) OVER (ORDER BY
    order_cols)``; the plan range-partitions on the total order,
    turns per-partition counts (<= #shuffle-partitions rows) into
    broadcast cumulative offsets, and derives the bucket from
    offset + per-partition row_number with integer-exact math — no
    data-cardinality row ever crosses a SinglePartition window."""
    spark = df.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = df.repartitionByRange(n_part, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_prior = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = (
        ranged.groupBy("_pid")
        .agg(F.count("*").alias("_cnt"))
        .select(
            "_pid",
            F.coalesce(F.sum("_cnt").over(w_prior), F.lit(0)).alias("_off"),
            F.sum("_cnt").over(w_all).alias("_n"),
        )
    )
    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    r = (F.col("_off") + F.row_number().over(w_local)).alias("_rank")
    with_rank = ranged.join(F.broadcast(offsets), "_pid").select(
        *df.columns, r, F.col("_n")
    )
    # SQL ntile(n): base = _n div n, rem = _n mod n; the first rem
    # buckets hold base+1 rows. rank <= rem*(base+1) -> bucket from
    # the wide region, else offset into the narrow region.
    k = F.lit(n_buckets).cast("long")
    base = ((F.col("_n") - (F.col("_n") % k)) / k).cast("long")
    rem = F.col("_n") % k
    rank = F.col("_rank")
    wide_span = rem * (base + 1)
    in_wide = rank <= wide_span
    bucket_wide = ((rank - 1 - ((rank - 1) % (base + 1))) / (base + 1)).cast(
        "long"
    ) + 1
    over = rank - wide_span
    bucket_narrow = (
        rem
        + ((over - 1 - ((over - 1) % F.greatest(base, F.lit(1))))
           / F.greatest(base, F.lit(1))).cast("long")
        + 1
    )
    bucket = F.when(in_wide, bucket_wide).otherwise(bucket_narrow)
    return with_rank.select(
        *df.columns, bucket.cast("int").alias(out_col)
    )


def events_rfm_segments(spark, sf_dir):
    """RFM customer scorecard over the events stream: per user,
    Recency (days since last activity, vs the corpus max date),
    Frequency (purchase count), Monetary (exact-decimal purchase
    revenue), each cut into quintiles by the partition-safe
    distributed ntile — deterministic total orders (metric, user_id)
    make every cut engine-exact — then segment-level rollup. The
    classic marketing segmentation ("5-5-5 champions", "1-1-1
    lost") computed the way a 100 TB event store needs it.

    Recency quintile 5 = most recent; frequency/monetary quintile
    5 = highest: each metric orders so quintile 1 is "worst", via
    (metric_direction, user_id) total orders.

    Plan (100 TB): ONE user-keyed hash-agg builds all three metrics
    (conditional aggregation — no second pass over events), then
    three _distributed_ntile range exchanges over the user-level
    frame (users << events); the final segment rollup is a bounded
    125-cell hash-agg."""
    e = load(spark, sf_dir, "events")
    is_p = F.col("event_type") == "purchase"
    per_user = e.groupBy("user_id").agg(
        F.max(F.to_date("ts")).alias("last_day"),
        F.sum(F.when(is_p, 1).otherwise(0)).cast("long").alias("freq"),
        F.coalesce(
            F.sum(F.when(is_p, F.col("value").cast("decimal(18,4)"))),
            F.lit(0).cast("decimal(18,4)"),
        ).alias("monetary"),
    )
    max_day = per_user.agg(F.max("last_day").alias("d")).select("d")
    u = per_user.join(F.broadcast(max_day)).withColumn(
        "recency_days", F.datediff(F.col("d"), F.col("last_day")).cast("long")
    ).drop("d")
    u = _distributed_ntile(
        u, 5, [F.desc("recency_days"), F.asc("user_id")], "r_q"
    )
    u = _distributed_ntile(u, 5, [F.asc("freq"), F.asc("user_id")], "f_q")
    u = _distributed_ntile(u, 5, [F.asc("monetary"), F.asc("user_id")], "m_q")
    return (
        u.groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.round(F.sum("monetary").cast("double"), 4).alias("monetary"),
            F.sum("freq").cast("long").alias("n_purchases"),
        )
        .orderBy("r_q", "f_q", "m_q")
    )


def events_rolling_mad_anomaly(spark, sf_dir):
    """Rolling robust anomaly detection per user: over each user's
    last 7 events (6 preceding + current, ordered by the
    deterministic (ts, event_id) total order), the EXACT rolling
    median of `value` and the median absolute deviation (MAD), and
    a flag for points beyond 3 MADs — the outlier screen that, unlike
    z-scores, a single spike cannot poison. Median/MAD are computed
    from the sorted frame array (average-of-middles for even
    frames), identical IEEE arithmetic to the oracle's replay, so
    the flag is engine-exact; both statistics are also emitted
    rounded for the value hash.

    Plan (100 TB): ONE user-keyed shuffle for the window; the frame
    is a bounded 7-row rowsBetween, so state per row is O(7)
    whatever the corpus — no unbounded running state, no
    sort-the-world. The sort/median runs inside the projection on a
    7-element array (whole-stage codegen, no UDF)."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    frame = F.array_sort(F.collect_list("value").over(w))

    def _median(arr):
        n = F.size(arr)
        lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
        hi = F.element_at(arr, (n / 2).cast("int") + 1)
        return F.when(n % 2 == 1, lo).otherwise((lo + hi) / 2.0)

    with_frame = e.select(
        "user_id", "event_id", "value", frame.alias("fr")
    )
    med = _median(F.col("fr"))
    with_med = with_frame.select(
        "user_id", "event_id", "value",
        F.size("fr").alias("n_in_frame"),
        med.alias("med"),
        F.array_sort(
            F.transform("fr", lambda x: F.abs(x - med))
        ).alias("devs"),
    )
    mad = _median(F.col("devs"))
    return with_med.select(
        "user_id", "event_id",
        F.round("value", 4).alias("value"),
        "n_in_frame",
        F.round("med", 4).alias("med"),
        F.round(mad, 4).alias("mad"),
        F.when(F.abs(F.col("value") - F.col("med")) > 3 * mad, 1)
        .otherwise(0).cast("int").alias("is_anomaly"),
    )


def events_user_diversity(spark, sf_dir):
    """Per-user behavioral diversity: the Gini-Simpson index
    1 - sum(p_i^2) over the user's event-type distribution, emitted
    as an EXACT parts-per-million integer (1e6 - (1e6*sum(c_i^2)) div
    n^2 — BIGINT floor division, no floating point anywhere), plus
    the raw counts. The screen that separates single-behavior bots
    (diversity 0) from organic multi-surface users — and, on a
    training corpus, repetitive-source detection by the same math.

    Plan (100 TB): one (user, type) hash-agg with map-side combine,
    then a user-keyed rollup whose per-user fan-in is bounded by the
    event-type vocabulary — two shuffles, both on keys with
    corpus-size-independent group width."""
    e = load(spark, sf_dir, "events")
    per_type = e.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("c")
    )
    return (
        per_type.groupBy("user_id")
        .agg(
            F.sum("c").cast("long").alias("n_events"),
            F.count("*").cast("long").alias("n_types"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_sq"),
        )
        .selectExpr(
            "user_id", "n_events", "n_types",
            "1000000 - (1000000 * sum_sq) div (n_events * n_events)"
            " AS diversity_ppm",
        )
    )


def events_kanonymity(spark, sf_dir, k: int = 5):
    """K-anonymity audit over the event stream's quasi-identifier
    tuple (event_type, value bucketed to 100s, activity date): the
    governance check run before releasing interaction data into a
    training corpus — any tuple shared by fewer than k distinct
    users re-identifies its members. Emits every equivalence class
    with its row count, distinct-user count, and an at_risk flag.

    Plan (100 TB): one hash-agg on the quasi-identifier tuple
    (count + count-distinct users via a two-level agg so the
    distinct never funnels), map-side partials throughout; class
    cardinality is data-dependent but each class row is O(1)."""
    e = load(spark, sf_dir, "events")
    qi = e.select(
        "event_type",
        F.floor(F.col("value") / 100).cast("long").alias("value_bucket"),
        F.to_date("ts").alias("day"),
        "user_id",
    )
    per_user = qi.groupBy(
        "event_type", "value_bucket", "day", "user_id"
    ).agg(F.count("*").cast("long").alias("n"))
    return (
        per_user.groupBy("event_type", "value_bucket", "day")
        .agg(
            F.sum("n").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_users"),
        )
        .select(
            "event_type", "value_bucket",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_rows", "n_users",
            F.when(F.col("n_users") < k, 1).otherwise(0)
            .cast("int").alias("at_risk"),
        )
    )


def events_churn_hazard(spark, sf_dir):
    """Discrete survival analysis of user lifetimes: per lifetime
    t (days between a user's first and last activity), the number of
    users churning exactly at t, the number still at risk (lifetime
    >= t), and the discrete hazard d(t)/n(t) as an EXACT ppm
    integer — the life table behind retention curves, computed
    without any floating point (the Kaplan-Meier survival curve is
    the running product of (1 - hazard); the hazard table is its
    sufficient statistic and stays integer-exact).

    Plan (100 TB): one user-keyed agg for lifetimes, then a
    lifetime histogram whose row count is bounded by the calendar
    span of the data (never user cardinality); the at-risk cumsum
    window runs over that bounded histogram — planning-scale
    metadata, same class as the Markov matrix normalization."""
    e = load(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts")))
        .cast("long")
        .alias("lifetime_days")
    )
    hist = per_user.groupBy("lifetime_days").agg(
        F.count("*").cast("long").alias("n_churned")
    )
    w = Window.orderBy(F.desc("lifetime_days")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        hist.withColumn(
            "n_at_risk", F.sum("n_churned").over(w).cast("long")
        )
        .selectExpr(
            "lifetime_days", "n_churned", "n_at_risk",
            "(1000000 * n_churned) div n_at_risk AS hazard_ppm",
        )
    )
