"""Relational operator library — SURVEY.md §2.9 scope over the TPC-H-ish tables.

The reference is a single-pipeline stream job with no joins/aggregations/
window functions of its own (SURVEY §2.9); this module supplies the full
relational surface a user would expect from the rebuilt engine, expressed
DataFrame-first so Catalyst plans them (broadcast vs sort-merge joins,
partial aggregation, pushdown/pruning all automatic).

Engine-parity conventions for the DuckDB oracles:

* Money sums use exact integer-cents arithmetic (``round(x*100)::BIGINT``)
  — double summation order differs between engines, integer sums don't.
* DuckDB ``SUM(integer)`` returns HUGEINT → always ``::BIGINT``.
* No raw TIMESTAMP output columns; epoch micros / date parts instead.
* Every computed column aliased identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_realtime_sessionize_sample_spark.plans.registry import query
from flink_realtime_sessionize_sample_spark.sources.registry import load_table


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100).cast("long")


# --- aggregation: TPC-H Q1-style pricing summary -------------------------

@query(
    "pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       sum(l_quantity)::BIGINT AS sum_qty,
       sum(round(l_extendedprice*100)::BIGINT)::BIGINT AS sum_base_cents,
       sum(round(l_extendedprice*100)::BIGINT * (100 - round(l_discount*100)::BIGINT))::BIGINT AS sum_disc_e4,
       sum(round(l_extendedprice*100)::BIGINT * (100 - round(l_discount*100)::BIGINT)
           * (100 + round(l_tax*100)::BIGINT))::BIGINT AS sum_charge_e6,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate with map-side partial agg; filter pushed to parquet."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    tax_pct = F.round(F.col("l_tax") * 100).cast("long")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            F.sum(_cents("l_extendedprice")).alias("sum_base_cents"),
            F.sum(_cents("l_extendedprice") * (100 - disc_pct)).alias("sum_disc_e4"),
            F.sum(_cents("l_extendedprice") * (100 - disc_pct) * (100 + tax_pct)).alias("sum_charge_e6"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- joins ----------------------------------------------------------------

@query(
    "top_revenue_orders",
    oracle="""
SELECT o.o_orderkey, o.o_orderpriority,
       sum(round(l.l_extendedprice*100)::BIGINT * (100 - round(l.l_discount*100)::BIGINT))::BIGINT AS revenue_e4
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, o.o_orderpriority
ORDER BY revenue_e4 DESC, o_orderkey ASC
LIMIT 10
""",
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-style 3-way join + top-k. customer is a dim → broadcast side; the
    orders⨝lineitem fact-fact join is hinted SHUFFLE_HASH with the build on
    the customer-FILTERED orders side — the smaller input after selectivity,
    so the per-partition hash build stays bounded at any scale, and it skips
    both sort passes of the default sort-merge (measured 1.6 s → 1.2 s at
    sf0.1; AQE may still override where statistics justify it)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .hint("shuffle_hash")
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(F.sum(_cents("l_extendedprice") * (100 - disc_pct)).alias("revenue_e4"))
        .orderBy(F.col("revenue_e4").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@query(
    "nation_revenue",
    oracle="""
SELECT n.n_name, r.r_name,
       sum(round(l.l_extendedprice*100)::BIGINT * (100 - round(l.l_discount*100)::BIGINT))::BIGINT AS revenue_e4,
       count(*) AS n_lineitems
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name, r.r_name
""",
)
def nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-style snowflake join: all three dims broadcast, zero extra shuffles
    on the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.sum(_cents("l_extendedprice") * (100 - disc_pct)).alias("revenue_e4"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@query(
    "order_priority_count",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""",
)
def order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-style EXISTS → left-semi join."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "customers_without_orders",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "customer_order_distribution",
    oracle="""
SELECT c_count, count(*)::BIGINT AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
""",
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13-style left outer join + double aggregation (0-order customers kept)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "supplier_customer_same_nation",
    oracle="""
SELECT n.n_name,
       count(DISTINCT c.c_custkey)::BIGINT AS n_customers,
       count(DISTINCT s.s_suppkey)::BIGINT AS n_suppliers
FROM nation n
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN supplier s ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def supplier_customer_same_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-free equi-join fan-out + COUNT DISTINCT (expand-based in Spark)."""
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return (
        n.join(c, c.c_nationkey == n.n_nationkey)
        .join(s, s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.countDistinct("s_suppkey").alias("n_suppliers"),
        )
    )


# --- grouping sets / rollup / cube ---------------------------------------

@query(
    "rollup_revenue",
    oracle="""
SELECT r.r_name, n.n_name,
       sum(round(o.o_totalprice*100)::BIGINT)::BIGINT AS total_cents,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""",
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.sum(_cents("o_totalprice")).alias("total_cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "cube_part_stats",
    oracle="""
SELECT p_brand, p_type,
       count(*) AS n_parts,
       round(avg(p_size), 4) AS avg_size,
       sum(round(p_retailprice*100)::BIGINT)::BIGINT AS sum_price_cents
FROM part
GROUP BY CUBE (p_brand, p_type)
""",
)
def cube_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.cube("p_brand", "p_type").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.avg("p_size"), 4).alias("avg_size"),
        F.sum(_cents("p_retailprice")).alias("sum_price_cents"),
    )


# --- window (analytic) functions ------------------------------------------

@query(
    "top_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, rnk, round(o_totalprice, 2) AS totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
)
WHERE rnk <= 3
""",
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via ranking window (single shuffle on the group key)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk", F.round("o_totalprice", 2).alias("totalprice"))
    )


@query(
    "customer_running_total",
    oracle="""
SELECT o_custkey, o_orderkey,
       (sum(round(o_totalprice*100)::BIGINT)
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS UNBOUNDED PRECEDING))::BIGINT AS running_cents,
       rank()       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rnk,
       dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS drnk
FROM orders
""",
)
def customer_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running frame + rank/dense_rank sharing one window spec."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_cents("o_totalprice")).over(run).alias("running_cents"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "event_lag_lead",
    oracle="""
SELECT event_id, user_id, event_type,
       lag(event_type)  OVER w AS prev_type,
       lead(event_type) OVER w AS next_type,
       (epoch_us(ts)//1000000
        - lag(epoch_us(ts)//1000000) OVER w)::BIGINT AS gap_sec
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def event_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over event time — the analytic view of the session stream."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = (F.unix_micros("ts") / F.lit(1000000)).cast("long")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (sec - F.lag(sec).over(w)).alias("gap_sec"),
    )


# --- sorts / limits / top-k ------------------------------------------------

@query(
    "global_topk_orders",
    oracle="""
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20
""",
)
def global_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject (no full sort at scale)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("totalprice"), "o_orderpriority")
    )


# --- set operations ---------------------------------------------------------

@query(
    "setop_union",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
""",
)
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c_custkey"))
    return a.union(b).distinct()


@query(
    "setop_intersect",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
""",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c_custkey"))
    return a.intersect(b)


@query(
    "setop_except",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
""",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c_custkey"))
    return a.exceptAll(b).distinct()


# --- scalar function library ------------------------------------------------

@query(
    "scalar_string_funcs",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       lower(p_brand) AS brand_lower,
       length(p_name)::INT AS name_len,
       substring(p_name, 1, 5) AS name_pfx,
       replace(p_name, ' ', '_') AS name_snake,
       concat(p_brand, ':', p_type) AS brand_type,
       trim(p_name) AS name_trim,
       reverse(p_type) AS type_rev,
       strpos(p_name, 'widget')::INT AS widget_pos,
       (p_name LIKE '%widget%') AS is_widget,
       lpad(p_partkey::VARCHAR, 8, '0') AS key_padded,
       split_part(p_name, ' ', 1) AS first_word
FROM part
""",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface (all JVM built-ins, codegen'd)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.col("p_name")).alias("name_trim"),
        F.reverse(F.col("p_type")).alias("type_rev"),
        F.instr(F.col("p_name"), "widget").alias("widget_pos"),
        F.col("p_name").like("%widget%").alias("is_widget"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
    )


@query(
    "scalar_math_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
       abs(l_extendedprice - 50000) AS abs_diff,
       ceil(l_quantity)::BIGINT AS qty_ceil,
       floor(l_discount * 10)::BIGINT AS disc_floor,
       round(sqrt(l_extendedprice), 6) AS price_sqrt,
       round(ln(l_extendedprice), 6) AS price_ln,
       round(pow(l_quantity, 2), 4) AS qty_sq,
       (l_orderkey % 7)::BIGINT AS key_mod,
       sign(l_extendedprice - 50000)::DOUBLE AS price_sign,
       greatest(l_quantity, 25.0) AS qty_hi,
       least(l_quantity, 25.0) AS qty_lo
FROM lineitem
""",
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000).alias("abs_diff"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor(F.col("l_discount") * 10).alias("disc_floor"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.signum(F.col("l_extendedprice") - 50000).alias("price_sign"),
        F.greatest("l_quantity", F.lit(25.0)).alias("qty_hi"),
        F.least("l_quantity", F.lit(25.0)).alias("qty_lo"),
    )


@query(
    "scalar_date_funcs",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate)::INT AS order_year,
       quarter(o_orderdate)::INT AS order_quarter,
       month(o_orderdate)::INT AS order_month,
       day(o_orderdate)::INT AS order_day,
       (dayofweek(o_orderdate) + 1)::INT AS order_dow,
       date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)::INT AS days_since_95,
       epoch_us(date_trunc('month', o_orderdate)) AS month_start_us,
       strftime(o_orderdate, '%Y-%m') AS order_ym
FROM orders
""",
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function surface. DuckDB dayofweek is 0=Sunday; Spark's is
    1=Sunday — normalized to Spark's convention in the oracle."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias("days_since_95"),
        F.unix_micros(F.date_trunc("month", "o_orderdate")).alias("month_start_us"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_ym"),
    )


@query(
    "json_extract_events",
    oracle="""
SELECT event_type,
       count(*) AS n_events,
       sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
       round(avg(json_extract_string(props, '$.k')::BIGINT), 6) AS avg_k
FROM events
GROUP BY event_type
""",
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column access (the events.props payload) + aggregation."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 6).alias("avg_k"),
    )


@query(
    "events_hourly_windows",
    oracle="""
SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
       event_type,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM events
GROUP BY 1, 2
""",
)
def events_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time windows, batch formulation (streaming variant in
    streaming/ uses the same expressions under a watermark)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.unix_micros(F.date_trunc("hour", "ts")).alias("window_start_us"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "conditional_agg",
    oracle="""
SELECT c_mktsegment,
       count(*) AS n_customers,
       sum(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END)::BIGINT AS n_rich,
       sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END)::BIGINT AS n_negative,
       sum(round(c_acctbal*100)::BIGINT)::BIGINT AS sum_bal_cents,
       round(min(c_acctbal), 2) AS min_bal,
       round(max(c_acctbal), 2) AS max_bal,
       count(DISTINCT c_nationkey)::BIGINT AS n_nations
FROM customer
GROUP BY c_mktsegment
""",
)
def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.when(F.col("c_acctbal") > 5000, 1).otherwise(0)).alias("n_rich"),
        F.sum(F.when(F.col("c_acctbal") < 0, 1).otherwise(0)).alias("n_negative"),
        F.sum(_cents("c_acctbal")).alias("sum_bal_cents"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.countDistinct("c_nationkey").alias("n_nations"),
    )


@query(
    "approx_distinct_users",
    oracle="""
SELECT event_type,
       count(*)::BIGINT AS n_events,
       count(DISTINCT user_id)::BIGINT AS exact_users,
       TRUE AS approx_within_2pct
FROM events GROUP BY event_type
""",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct. Sketch VALUES are engine-specific,
    so the oracle can't compare them — instead this emits a **bounds check**:
    exact anchors (row count, exact distinct) plus a boolean asserting the
    HLL estimate is within 2% of exact (rsd=0.01 ⇒ 2% ≈ 2σ; at sf-scale
    cardinalities HLL++'s sparse mode is exact anyway). The DuckDB twin
    emits literal TRUE — the value-hash match IS the accuracy assertion."""
    ev = load_table(spark, sf_dir, "events")
    exact = F.countDistinct("user_id")
    approx = F.approx_count_distinct("user_id", 0.01)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        exact.alias("exact_users"),
        (F.abs(approx - exact) <= exact * F.lit(0.02)).alias("approx_within_2pct"),
    )


@query(
    "hll_mergeable_distinct",
    oracle="""
WITH per_type AS (
  SELECT event_type, count(DISTINCT user_id)::BIGINT AS exact_users
  FROM events GROUP BY event_type
)
SELECT event_type, exact_users,
       TRUE AS sketch_within_5pct,
       TRUE AS union_within_5pct
FROM per_type
""",
)
def hll_mergeable_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE HyperLogLog sketches (Apache DataSketches, Spark 3.5+
    ``hll_sketch_agg``/``hll_union_agg``): per-group sketches built once,
    then ROLLED UP to a global estimate by unioning the sketch binaries —
    no second scan of the fact table. This is the pre-aggregation pattern
    behind incremental distinct-count dashboards at 100 TB: store one
    ~2-16 KB sketch per (segment, day), answer any segment-union query by
    merging sketches. ``approx_distinct_users`` covers the one-shot HLL++
    aggregate; this covers sketch REUSE.

    Oracle discipline: sketch bytes are engine-specific, so (as with every
    approx operator here) the query emits exact anchors plus accuracy
    booleans — estimate within 5% of exact (lgConfigK=12 ⇒ rsd ≈ 1.6%,
    5% ≈ 3σ) — and the DuckDB twin emits literal TRUE.
    """
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    # Global rollup touches only |event_types| sketch rows, never events.
    union = sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(False))).alias("est_total")
    )
    exact_total = ev.agg(F.countDistinct("user_id").alias("exact_total"))
    est = F.hll_sketch_estimate("sk")
    return (
        sk.crossJoin(F.broadcast(union))
        .crossJoin(F.broadcast(exact_total))
        .select(
            "event_type",
            "exact_users",
            (F.abs(est - F.col("exact_users")) <= F.col("exact_users") * F.lit(0.05)).alias(
                "sketch_within_5pct"
            ),
            (
                F.abs(F.col("est_total") - F.col("exact_total"))
                <= F.col("exact_total") * F.lit(0.05)
            ).alias("union_within_5pct"),
        )
    )


@query(
    "theta_set_algebra_distinct",
    oracle="""
WITH v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
     c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
SELECT (SELECT count(*) FROM v)::BIGINT AS exact_view,
       (SELECT count(*) FROM c)::BIGINT AS exact_click,
       (SELECT count(*) FROM (SELECT * FROM v UNION SELECT * FROM c))::BIGINT AS exact_union,
       (SELECT count(*) FROM (SELECT * FROM v INTERSECT SELECT * FROM c))::BIGINT AS exact_intersect,
       (SELECT count(*) FROM (SELECT * FROM v EXCEPT SELECT * FROM c))::BIGINT AS exact_diff,
       TRUE AS union_within_5pct,
       TRUE AS intersect_within_5pct,
       TRUE AS diff_within_5pct
""",
)
def theta_set_algebra_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta sketches (Apache DataSketches): distinct-count SET ALGEBRA —
    union, INTERSECTION, and difference of the viewer and clicker user
    sets estimated from two per-segment sketches. Intersection/difference
    are what HLL cannot do: at 100 TB this answers "distinct users who did
    A and B" from two pre-aggregated ~KB sketches instead of a distinct
    self-join of the fact table. Sketches build in one scan (two filtered
    aggregates); all set ops run on the two sketch scalars.

    Same approx-oracle discipline as the HLL queries: exact anchors +
    accuracy booleans (default lgNomEntries=12 ⇒ rsd ≈ 1.6%, 5% ≈ 3σ; at
    sub-4096 cardinalities theta keeps every hash and is exact), with the
    DuckDB twin emitting literal TRUE.
    """
    ev = load_table(spark, sf_dir, "events")
    sk = ev.agg(
        F.theta_sketch_agg(F.when(F.col("event_type") == "view", F.col("user_id"))).alias(
            "sk_v"
        ),
        F.theta_sketch_agg(F.when(F.col("event_type") == "click", F.col("user_id"))).alias(
            "sk_c"
        ),
        F.countDistinct(
            F.when(F.col("event_type") == "view", F.col("user_id"))
        ).alias("exact_view"),
        F.countDistinct(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("exact_click"),
        F.countDistinct(
            F.when(F.col("event_type").isin("view", "click"), F.col("user_id"))
        ).alias("exact_union"),
    )
    exacts = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .groupBy("user_id")
        .agg(F.collect_set("event_type").alias("ets"))
        .agg(
            F.sum(
                (F.array_contains("ets", "view") & F.array_contains("ets", "click")).cast(
                    "long"
                )
            ).alias("exact_intersect"),
            F.sum(
                (F.array_contains("ets", "view") & ~F.array_contains("ets", "click")).cast(
                    "long"
                )
            ).alias("exact_diff"),
        )
    )
    est_u = F.theta_sketch_estimate(F.theta_union("sk_v", "sk_c"))
    est_i = F.theta_sketch_estimate(F.theta_intersection("sk_v", "sk_c"))
    est_d = F.theta_sketch_estimate(F.theta_difference("sk_v", "sk_c"))

    def within(est, exact):
        return F.abs(est - F.col(exact)) <= F.greatest(
            F.col(exact) * F.lit(0.05), F.lit(1.0)
        )

    return sk.crossJoin(F.broadcast(exacts)).select(
        "exact_view",
        "exact_click",
        "exact_union",
        "exact_intersect",
        "exact_diff",
        within(est_u, "exact_union").alias("union_within_5pct"),
        within(est_i, "exact_intersect").alias("intersect_within_5pct"),
        within(est_d, "exact_diff").alias("diff_within_5pct"),
    )


@query(
    "kll_mergeable_quantiles",
    oracle="""
SELECT l_returnflag, count(*)::BIGINT AS n_rows,
       TRUE AS p50_rank_within_3pct,
       TRUE AS p90_rank_within_3pct,
       TRUE AS p99_rank_within_3pct
FROM lineitem GROUP BY l_returnflag
""",
)
def kll_mergeable_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile sketches (Apache DataSketches): per-group sketches of
    ``l_extendedprice`` whose GLOBAL quantiles come from merging the group
    sketches — the mergeable-quantile pattern that lets 100 TB pipelines
    keep one small sketch per (segment, file, day) and answer any rollup's
    p50/p90/p99 without rescanning (``approx_price_quantiles`` covers the
    one-shot t-digest; this covers merge/reuse).

    Accuracy is checked in RANK space, the metric KLL actually bounds
    (k=200 ⇒ ±1.65% normalized rank error at 99% confidence): the exact
    rank of each merged-sketch quantile estimate, computed with one plain
    aggregate pass, must sit within 3% of its target. Exact anchors +
    booleans; the DuckDB twin emits literal TRUE.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_group = li.groupBy("l_returnflag").agg(
        F.kll_sketch_agg_double("l_extendedprice").alias("sk"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    # kll_sketch_merge_double is a binary scalar: fold the |groups| group
    # sketches (one tiny collected array) with a higher-order reduce.
    merged = per_group.agg(F.collect_list("sk").alias("sks")).select(
        F.aggregate(
            F.slice("sks", 2, 1_000_000),
            F.element_at("sks", 1),
            lambda acc, x: F.kll_sketch_merge_double(acc, x),
        ).alias("sk_all")
    ).select(
        *[
            F.kll_sketch_get_quantile_double("sk_all", F.lit(q)).alias(f"est_p{int(q*100)}")
            for q in (0.5, 0.9, 0.99)
        ]
    )
    ranks = li.crossJoin(F.broadcast(merged)).agg(
        *[
            F.avg((F.col("l_extendedprice") <= F.col(f"est_p{p}")).cast("double")).alias(
                f"rank_p{p}"
            )
            for p in (50, 90, 99)
        ]
    )
    checks = [
        (F.abs(F.col(f"rank_p{p}") - F.lit(p / 100.0)) <= F.lit(0.03)).alias(
            f"p{p}_rank_within_3pct"
        )
        for p in (50, 90, 99)
    ]
    return per_group.select("l_returnflag", "n_rows").crossJoin(
        F.broadcast(ranks.select(*checks))
    )


@query(
    "top_supplier_revenue",
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
         sum(round(l_extendedprice*100)::BIGINT * (100 - round(l_discount*100)::BIGINT))::BIGINT AS revenue_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.revenue_e4
FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.revenue_e4 = (SELECT max(revenue_e4) FROM rev)
""",
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: per-supplier quarterly revenue, keep the max-revenue
    supplier(s) — the scalar-subquery-over-an-aggregate pattern. The max is
    taken with a window over the ALREADY-AGGREGATED per-supplier rows
    (dim-sized, one narrow exchange) so the lineitem scan+shuffle runs
    exactly once; re-deriving the scalar from the fact table would scan it
    twice."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_cents("l_extendedprice") * (100 - disc_pct)).alias("revenue_e4"))
    )
    mx = Window.partitionBy()  # post-agg rows are |suppliers| — safe global window
    return (
        rev.withColumn("_mx", F.max("revenue_e4").over(mx))
        .filter(F.col("revenue_e4") == F.col("_mx"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "revenue_e4")
    )


@query(
    "important_parts",
    oracle="""
WITH val AS (
  SELECT l_partkey,
         sum(round(l_extendedprice*100)::BIGINT * (100 - round(l_discount*100)::BIGINT))::BIGINT AS value_e4
  FROM lineitem GROUP BY l_partkey
)
SELECT v.l_partkey AS partkey, p.p_brand, v.value_e4
FROM val v JOIN part p ON v.l_partkey = p.p_partkey
WHERE v.value_e4 > (SELECT sum(value_e4) FROM val) / 1500
""",
)
def important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose traded value exceeds a fraction of the GLOBAL
    total — an aggregate compared against a scalar subquery over the same
    aggregate. The per-part aggregate is built once; the global total is an
    agg-of-agg whose plan shares the same hash-partitioned exchange, so
    Spark's ReuseExchange collapses the two branches to ONE fact scan and
    the scalar arrives via a 1-row broadcast (no single-partition window
    over the potentially huge |parts| set)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    # Explicit not-null filter so BOTH consumers of `val` (threshold branch
    # and main branch) have byte-identical subplans: the downstream equi
    # join infers isnotnull on its side only, which would otherwise break
    # exchange reuse and scan the fact table twice.
    val = (
        li.filter(F.col("l_partkey").isNotNull())
        .groupBy("l_partkey")
        .agg(F.sum(_cents("l_extendedprice") * (100 - disc_pct)).alias("value_e4"))
    )
    total = val.agg((F.sum("value_e4") / 1500).cast("long").alias("_thr"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value_e4") > F.col("_thr"))
        .join(F.broadcast(p), val.l_partkey == p.p_partkey)
        .select(F.col("l_partkey").alias("partkey"), "p_brand", "value_e4")
    )


@query(
    "large_quantity_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey, sum(l_quantity)::BIGINT AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 250
)
SELECT c.c_name, o.o_orderkey,
       round(o.o_totalprice*100)::BIGINT AS total_cents, b.total_qty
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN big b ON o.o_orderkey = b.l_orderkey
""",
)
def large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: orders whose lineitem quantity total clears a threshold
    (the IN-subquery-with-HAVING pattern, planned as agg → join). The
    HAVING filter collapses the fact table to qualifying orderkeys BEFORE
    the join with orders; customer is a broadcast dim."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_name", "o_orderkey", _cents("o_totalprice").alias("total_cents"), "total_qty")
    )


@query(
    "balance_band_reconciliation",
    oracle="""
WITH c AS (SELECT floor(c_acctbal / 1000)::BIGINT AS band, count(*) AS n_cust
           FROM customer GROUP BY 1),
s AS (SELECT floor(s_acctbal / 1000)::BIGINT AS band, count(*) AS n_supp
      FROM supplier GROUP BY 1)
SELECT coalesce(c.band, s.band)::BIGINT AS band,
       coalesce(c.n_cust, 0)::BIGINT AS n_cust,
       coalesce(s.n_supp, 0)::BIGINT AS n_supp,
       (c.band IS NULL OR s.band IS NULL) AS one_sided
FROM c FULL OUTER JOIN s ON c.band = s.band
""",
)
def balance_band_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join reconciliation — the audit-join shape (which bands
    exist on one side only?). Joins two already-aggregated dim-sized
    inputs, so the outer join is cheap regardless of fact-table scale; the
    null-padding from both directions is genuinely exercised (supplier
    bands are sparser than customer bands at every sf)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.floor(F.col("c_acctbal") / 1000).alias("band"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.floor(F.col("s_acctbal") / 1000).alias("band"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, "band", "full_outer").select(
        F.col("band").cast("long").alias("band"),
        F.coalesce("n_cust", F.lit(0)).cast("long").alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).cast("long").alias("n_supp"),
        (F.col("n_cust").isNull() | F.col("n_supp").isNull()).alias("one_sided"),
    )


@query(
    "approx_price_quantiles",
    oracle="""
SELECT l_returnflag,
       count(*)::BIGINT AS n,
       TRUE AS ap50_in_bounds,
       TRUE AS ap99_in_bounds
FROM lineitem GROUP BY l_returnflag
""",
)
def approx_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (t-digest): one mergeable-sketch pass instead of the
    sort-based exact percentile — the 100 TB quantile tool. Sketch values
    are engine-specific, so the oracle checks **rank-error bounds**: the
    estimate must land between the exact q∓0.01 percentiles (the sketch's
    guarantee at accuracy=10000 is 1e-4 rank error — 100× headroom). The
    DuckDB twin emits literal TRUE; the value-hash match is the accuracy
    assertion. A tighter sweep lives in tests/test_llm_ops.py."""
    li = load_table(spark, sf_dir, "lineitem")

    def in_bounds(q: float):
        return F.expr(
            f"approx_percentile(l_extendedprice, {q}, 10000) "
            f"between percentile(l_extendedprice, {q - 0.01}) "
            f"and percentile(l_extendedprice, {min(q + 0.01, 1.0)})"
        )

    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        in_bounds(0.5).alias("ap50_in_bounds"),
        in_bounds(0.99).alias("ap99_in_bounds"),
    )


@query(
    "profit_by_nation_year",
    oracle="""
SELECT n.n_name AS nation,
       year(o.o_orderdate)::INT AS o_year,
       sum(round(l.l_extendedprice*100)::BIGINT * (100 - round(l.l_discount*100)::BIGINT))::BIGINT AS revenue_e4
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%g%'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY nation, o_year
""",
)
def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted — the testdata has no partsupp, so profit =
    discounted revenue): five-way join lineitem⋈part⋈supplier⋈nation⋈orders
    with a LIKE filter on the part side, grouped by supplier nation ×
    order year. The multi-join exercise Catalyst actually optimizes: the
    p_name filter prunes part BEFORE the join (pushdown), part/supplier/
    nation are broadcast (small dims), lineitem — the only big table —
    shuffles zero times before its joins and once for the final (nation,
    year) aggregate, which partial-aggregates map-side. Exact
    integer-cents×e2 revenue arithmetic for engine-neutral hashing."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%g%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    rev = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(rev).alias("revenue_e4"))
    )


# --- Q21-style multi-correlated EXISTS / NOT EXISTS -----------------------

@query(
    "waiting_suppliers_q21",
    oracle="""
WITH late AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
), members AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
)
SELECT s.s_name, count(*)::BIGINT AS numwait
FROM late l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM members m
              WHERE m.l_orderkey = l1.l_orderkey AND m.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
)
def waiting_suppliers_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — the hardest classic subquery pattern: suppliers who
    were the SOLE late shipper in multi-supplier finished orders, via one
    correlated EXISTS and one correlated NOT EXISTS over the same fact.
    "Late" is adapted to this schema (no l_receiptdate): shipped more than
    60 days after the order date.

    Spark formulation: both correlated subqueries become join operators the
    optimizer can schedule — EXISTS → left-semi, NOT EXISTS → left-anti,
    each on ``l_orderkey`` with the ``suppkey <>`` residual — and the
    ``late``/``members`` sets are deduped BEFORE the joins, so join inputs
    are minimal and all three legs share hash partitioning on
    ``l_orderkey``. The supplier name lookup broadcasts the dim at the end,
    after the heavy semi/anti reduction.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    members = li.select("l_orderkey", "l_suppkey").distinct()
    l1 = late
    m = members.select(
        F.col("l_orderkey").alias("m_orderkey"), F.col("l_suppkey").alias("m_suppkey")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    sole_late = (
        l1.join(
            m,
            (l1.l_orderkey == m.m_orderkey) & (l1.l_suppkey != m.m_suppkey),
            "left_semi",
        )
        .join(
            l3,
            (l1.l_orderkey == l3.x_orderkey) & (l1.l_suppkey != l3.x_suppkey),
            "left_anti",
        )
    )
    return (
        sole_late.join(F.broadcast(s), sole_late.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


# --- array set / ordering functions ---------------------------------------

@query(
    "array_set_funcs",
    oracle="""
WITH base AS (
  SELECT vec_id,
         list_transform(embedding[1:6], x -> CAST(floor(x::DOUBLE * 1000) AS INT)) AS a,
         list_transform(embedding[4:9], x -> CAST(floor(x::DOUBLE * 1000) AS INT)) AS b
  FROM embeddings WHERE vec_id % 20 = 0
)
SELECT vec_id,
       array_to_string(list_sort(a), ',') AS a_sorted,
       array_to_string(list_sort(list_distinct(list_concat(a, b))), ',') AS union_ab,
       array_to_string(list_sort(list_distinct(list_intersect(a, b))), ',') AS intersect_ab,
       array_to_string(list_sort(list_distinct(list_filter(a, x -> NOT list_contains(b, x)))), ',') AS except_ab,
       list_contains(a, a[1]) AS contains_first,
       len(a) AS n_a
FROM base
""",
)
def array_set_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set-algebra + ordering coverage (§2.9 scalar library): sort,
    distinct-union, intersect, except, membership — all JVM codegen
    expressions, no explode, no shuffle (pure per-row projection over the
    scan). Arrays are floored to ints BEFORE set ops so cross-engine float
    repr can't perturb the value hash; the multiply is forced to DOUBLE on
    both engines (float32-vs-double products floor differently at boundary
    values — caught by the sf0.1 sweep). Output arrays are rendered to
    canonical comma-joined strings in BOTH engines: the external driver's
    row canonicalizer hashes cells and cannot hash Python lists
    (CORRECTNESS_r04 ``TypeError: unhashable type: 'list'``); string
    rendering keeps the value comparison exact while making every cell a
    hashable scalar.
    """
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 20 == 0)
    to_int = lambda col: F.expr(f"transform({col}, x -> cast(floor(cast(x as double) * 1000) as int))")  # noqa: E731
    base = emb.select(
        "vec_id",
        to_int("slice(embedding, 1, 6)").alias("a"),
        to_int("slice(embedding, 4, 6)").alias("b"),
    )
    return base.select(
        "vec_id",
        F.array_join(F.array_sort("a"), ",").alias("a_sorted"),
        F.array_join(F.array_sort(F.array_distinct(F.array_union("a", "b"))), ",").alias("union_ab"),
        F.array_join(F.array_sort(F.array_distinct(F.array_intersect("a", "b"))), ",").alias("intersect_ab"),
        F.array_join(F.array_sort(F.array_distinct(F.array_except("a", "b"))), ",").alias("except_ab"),
        F.expr("array_contains(a, element_at(a, 1))").alias("contains_first"),
        F.size("a").alias("n_a"),
    )


@query(
    "setop_intersect_all",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT ALL
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000
""",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics INTERSECT ALL (multiplicity = min of the two sides) —
    the multiset complement of the set-semantics family above; Catalyst
    plans it as a count-aggregated join, no distinct collapse."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_totalprice") > 100000).select(F.col("o_custkey").alias("custkey"))
    return a.intersectAll(b)


@query(
    "setop_except_all",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT ALL
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000
""",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics EXCEPT ALL (multiplicity = left minus right, floored
    at zero) — preserves duplicate counts the set-semantics EXCEPT erases."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_totalprice") > 100000).select(F.col("o_custkey").alias("custkey"))
    return a.exceptAll(b)
