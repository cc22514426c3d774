"""TPC-H shape suite (round 5): the join/subquery patterns real warehouse
users hit first, as distinct oracle-checked registry rows.

The registry already held Q1 (``pricing_summary``), Q9
(``profit_by_nation_year``), Q11/Q15/Q18 shapes, Q13-sans-filter
(``customer_order_distribution``), Q17 (``small_quantity_revenue``),
Q19-flavor (``disjunctive_brand_revenue``) and Q21
(``waiting_suppliers_q21``). This module adds the remaining distinct
shapes: Q2 (correlated min over a dim join), Q3, Q5, Q6, Q7, Q8, Q10,
Q12, Q13-with-ON-clause-filter, Q14, Q16, Q20 (nested semi-join), Q22
(scalar-subquery threshold + anti-join).

Adaptations forced by the testdata schema (TESTDATA.md): there is no
partsupp table, so the part↔supplier relation derives from lineitem
(``GROUP BY l_partkey, l_suppkey``); no l_shipmode/commitdate/receiptdate,
so Q12's lateness predicate is ship-vs-order-date; no c_phone, so Q22's
country code is ``c_nationkey % 5``. The SHAPE (plan pattern) is the
point, and each docstring names it.

Engine-parity conventions follow relational_queries.py: integer-cents
arithmetic for money, ``::BIGINT`` on DuckDB integer sums, no raw
TIMESTAMP outputs, identical aliases both sides, and any ORDER BY+LIMIT
uses a total order (unique tiebreaker) so the row set is deterministic.

Scale notes common to all: nation/region are broadcast explicitly (fixed
25/5 rows); supplier/part/customer are left unhinted so AQE picks
broadcast at test scale but can fall back to shuffle joins at 100 TB
(they all scale with SF); lineitem/orders never broadcast. Filters are
applied before joins so they reach the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_sessionize_sample_spark.plans.registry import query
from flink_realtime_sessionize_sample_spark.sources.registry import load_table


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100).cast("long")


# revenue in e4 fixed point: cents * (100 - discount_pct)
_REV_E4_DUCK = (
    "round(l_extendedprice*100)::BIGINT * (100 - round(l_discount*100)::BIGINT)"
)


def _rev_e4() -> F.Column:
    return _cents("l_extendedprice") * (100 - _cents("l_discount"))


# --- Q2: minimum-cost supplier (correlated min over a dim join) -----------

@query(
    "min_cost_supplier_q2",
    oracle=f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey, min(round(l_extendedprice*100)::BIGINT) AS cost_cents
  FROM lineitem GROUP BY l_partkey, l_suppkey
), eligible AS (
  SELECT ps.l_partkey, ps.cost_cents, s.s_name,
         round(s.s_acctbal*100)::BIGINT AS s_acctbal_cents, n.n_name
  FROM ps
  JOIN supplier s ON s.s_suppkey = ps.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'ASIA'
), minc AS (
  SELECT l_partkey, min(cost_cents) AS min_cost FROM eligible GROUP BY l_partkey
)
SELECT e.l_partkey AS p_partkey, p.p_type, e.s_name, e.n_name,
       e.s_acctbal_cents, e.cost_cents
FROM eligible e
JOIN minc m ON e.l_partkey = m.l_partkey AND e.cost_cents = m.min_cost
JOIN part p ON p.p_partkey = e.l_partkey AND p.p_size <= 15
ORDER BY e.s_acctbal_cents DESC, e.n_name, e.s_name, p_partkey
LIMIT 100
""",
)
def min_cost_supplier_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each part, the supplier(s) achieving the MINIMUM
    cost within a region — the correlated-min-over-a-dim-join pattern
    (aggregate subquery correlated on the outer join key). No partsupp in
    the testdata, so cost = min observed extended price per (part,
    supplier) from lineitem.

    Plan: the (part, supplier) cost table is one hash aggregate of
    lineitem; the region restriction prunes it via broadcast nation/region
    BEFORE the per-part min (so the correlated aggregate only sees
    eligible rows — the classic decorrelation). The per-part min is a
    window over the partkey partitioning (NOT an aggregate + self-join:
    that formulation materializes the whole eligible subtree twice —
    lineitem agg + three joins — unless exchange reuse happens to fire;
    the window is one pass over one exchange, balanced by partkey).
    ORDER BY has a unique (acctbal, nation, supplier, part) suffix so
    LIMIT 100 is deterministic."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 15)

    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_cents("l_extendedprice")).alias("cost_cents")
    )
    eligible = (
        ps.join(s, ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "l_partkey",
            "cost_cents",
            "s_name",
            _cents("s_acctbal").alias("s_acctbal_cents"),
            "n_name",
        )
    )
    w_part = Window.partitionBy("l_partkey")
    return (
        eligible.withColumn("_min_cost", F.min("cost_cents").over(w_part))
        .filter(F.col("cost_cents") == F.col("_min_cost"))
        .drop("_min_cost")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_type",
            "s_name",
            "n_name",
            "s_acctbal_cents",
            "cost_cents",
        )
        .orderBy(
            F.col("s_acctbal_cents").desc(),
            F.col("n_name").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        )
        .limit(100)
    )


# --- Q3: shipping priority (join + agg + deterministic top-k) -------------

@query(
    "shipping_priority_q3",
    oracle=f"""
SELECT l.l_orderkey,
       sum({_REV_E4_DUCK})::BIGINT AS revenue_e4,
       date_diff('day', TIMESTAMP '1995-01-01', o.o_orderdate)::INT AS orderdate_days,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l.l_orderkey, orderdate_days, o.o_orderpriority
ORDER BY revenue_e4 DESC, l.l_orderkey
LIMIT 10
""",
)
def shipping_priority_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customer ⋈ orders ⋈ lineitem with
    opposed date predicates, revenue aggregate per order, deterministic
    top-10 (orderkey tiebreak). Both filters sit below their joins
    (pushdown to the scans); the aggregate keys on l_orderkey so the
    orders⋈lineitem join partitioning is reused by the groupBy; the final
    top-10 is a TakeOrderedAndProject (bounded per-partition heap + O(10)
    merge), never a global sort."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            "l_orderkey",
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
            .cast("int")
            .alias("orderdate_days"),
            "o_orderpriority",
        )
        .agg(F.sum(_rev_e4()).alias("revenue_e4"))
        .select("l_orderkey", "revenue_e4", "orderdate_days", "o_orderpriority")
        .orderBy(F.col("revenue_e4").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


# --- Q5: local supplier volume (6-way join, same-nation predicate) --------

@query(
    "local_supplier_volume_q5",
    oracle=f"""
SELECT n.n_name, sum({_REV_E4_DUCK})::BIGINT AS revenue_e4
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'EUROPE'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name
""",
)
def local_supplier_volume_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the 6-way join with the extra SAME-NATION predicate
    (supplier nation = customer nation) folded into the supplier join —
    revenue where the supplier is local to the buyer, by nation within one
    region/year. The same-nation equality rides the supplier equi-join
    condition (no post-join filter), nation/region broadcast, date filter
    pushed to the orders scan, final aggregate keyed on 25-value n_name
    (map-side combine collapses it early)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            s,
            (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_rev_e4()).alias("revenue_e4"))
    )


# --- Q6: forecast revenue change (pure scan-filter-agg) -------------------

@query(
    "forecast_revenue_q6",
    oracle="""
SELECT coalesce(sum(round(l_extendedprice*100)::BIGINT * round(l_discount*100)::BIGINT), 0)::BIGINT
         AS revenue_e4
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND round(l_discount*100) BETWEEN 5 AND 7
  AND l_quantity < 24
""",
)
def forecast_revenue_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure scan→filter→scalar-aggregate query — the
    one every columnar engine must run at I/O speed. All three predicates
    push to the parquet scan (date range prunes row groups via min/max
    stats); the discount band compares exact integer percent (floats at
    representation boundaries differ between engines); the whole plan is
    one WholeStageCodegen over the scan plus a 1-row partial-agg collapse.
    At 100 TB this is the query that proves pushdown works: bytes read ≈
    three columns of the date-matching row groups, nothing more."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & _cents("l_discount").between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.coalesce(
                F.sum(_cents("l_extendedprice") * _cents("l_discount")), F.lit(0)
            )
            .cast("long")
            .alias("revenue_e4")
        )
    )


# --- Q7: bilateral volume between two nations by year ---------------------

@query(
    "global_sales_channel_q7",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l.l_shipdate)::INT AS l_year,
       sum({_REV_E4_DUCK.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')})::BIGINT AS revenue_e4
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY supp_nation, cust_nation, l_year
""",
)
def global_sales_channel_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by ship
    year — the self-joined-dimension pattern (nation joined twice under
    different roles) with a disjunctive cross-role predicate. Both nation
    joins broadcast; the disjunction evaluates on the 2×2 broadcast
    product, not by unioning two five-way joins. Two-year ship window
    pushed to the lineitem scan."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("n1_key") == s.s_nationkey)
        .join(F.broadcast(n2), F.col("n2_key") == c.c_nationkey)
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(_rev_e4()).alias("revenue_e4"))
    )


# --- Q8: national market share within a region ----------------------------

@query(
    "national_market_share_q8",
    oracle=f"""
WITH all_nations AS (
  SELECT year(o.o_orderdate)::INT AS o_year,
         {_REV_E4_DUCK.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')} AS rev_e4,
         n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n1.n_regionkey AND r.r_name = 'AMERICA'
  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
  WHERE p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1998-01-01'
)
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_1' THEN rev_e4 ELSE 0 END)::DOUBLE
             / sum(rev_e4)::DOUBLE, 6) + 0.0 AS mkt_share
FROM all_nations
GROUP BY o_year
""",
)
def national_market_share_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's market share of a part type sold into a
    region, by year — the conditional-aggregate-ratio pattern (share =
    SUM(CASE)/SUM over the same joined set, computed in ONE aggregate
    pass, not two joined subqueries). Part-type filter prunes part before
    its join; customer-side nation/region restricts the market, the
    supplier-side nation only labels rows (no filter). Integer e4 revenue
    summed exactly, converted to double only for the final 6dp share."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    rev = _rev_e4()
    return (
        p.join(li, p.p_partkey == li.l_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("n1_key") == c.c_nationkey)
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n1_region"))
        .join(F.broadcast(n2), F.col("n2_key") == s.s_nationkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                F.round(
                    F.sum(
                        F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(
                            F.lit(0)
                        )
                    ).cast("double")
                    / F.sum(rev).cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("mkt_share")
        )
    )


# --- Q10: returned-item customers (deterministic top-20) ------------------

@query(
    "returned_item_customers_q10",
    oracle=f"""
SELECT c.c_custkey, c.c_name,
       sum({_REV_E4_DUCK.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')})::BIGINT AS revenue_e4,
       round(c.c_acctbal*100)::BIGINT AS c_acctbal_cents,
       n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01' AND o.o_orderdate < TIMESTAMP '1997-07-01'
GROUP BY c.c_custkey, c.c_name, c_acctbal_cents, n.n_name
ORDER BY revenue_e4 DESC, c.c_custkey
LIMIT 20
""",
)
def returned_item_customers_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers who returned the most revenue in a
    two-quarter window — join-heavy aggregate with a deterministic top-20
    (custkey tiebreak → TakeOrderedAndProject, no global sort). The
    returnflag filter pushes to the lineitem scan; the aggregate keys on
    the customer, so the orders⋈customer partitioning carries through."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy(
            "c_custkey",
            "c_name",
            _cents("c_acctbal").alias("c_acctbal_cents"),
            "n_name",
        )
        .agg(F.sum(_rev_e4()).alias("revenue_e4"))
        .select("c_custkey", "c_name", "revenue_e4", "c_acctbal_cents", "n_name")
        .orderBy(F.col("revenue_e4").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# --- Q12: late shipments × order priority (conditional agg) ---------------

@query(
    "shipping_modes_q12",
    oracle="""
SELECT l.l_linestatus,
       sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT
         AS high_line_count,
       sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT
         AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 30 DAY
  AND l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l.l_linestatus
""",
)
def shipping_modes_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late shipments bucketed by line status, counting
    high- vs low-priority orders in one conditional-aggregate pass (the
    CASE-pivot pattern). The testdata has no l_shipmode/commitdate, so the
    grouping dimension is l_linestatus and "late" = shipped ≥ 30 days
    after the order date — the cross-table inequality still evaluates
    inside the join, and the year filter pushes to the lineitem scan."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


# --- Q13: order-count distribution with ON-clause join filter -------------

@query(
    "customer_order_distribution_q13",
    oracle="""
SELECT c_count, count(*)::BIGINT AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c.c_custkey
) t
GROUP BY c_count
""",
)
def customer_order_distribution_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 with the defining twist the plain variant
    (``customer_order_distribution``) lacks: the order filter lives in the
    LEFT JOIN's ON clause, not WHERE — customers whose every order is
    filtered out must still appear with count 0 (a WHERE clause would
    silently drop them). COUNT(o_orderkey) counts only matched rows (NULL
    join misses don't count). Two cascaded aggregates: per-customer count
    (rides the join partitioning), then the tiny count-of-counts."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --- Q14: promo revenue share (single-row ratio) --------------------------

@query(
    "promo_revenue_share_q14",
    oracle=f"""
SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN {_REV_E4_DUCK.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}
                              ELSE 0 END)::DOUBLE
             / sum({_REV_E4_DUCK.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')})::DOUBLE, 6) + 0.0
         AS promo_revenue_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01' AND l.l_shipdate < TIMESTAMP '1997-04-01'
""",
)
def promo_revenue_share_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percentage of one month's revenue from promo parts
    — conditional-aggregate ratio over a join, one pass. The month filter
    pushes to the lineitem scan so the part join only sees ~1/36 of the
    table; exact integer e4 revenue, double only at the final percent."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = _rev_e4()
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            (
                F.round(
                    F.lit(100.0)
                    * F.sum(
                        F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
                    ).cast("double")
                    / F.sum(rev).cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("promo_revenue_pct")
        )
    )


# --- Q16: supplier diversity per part class (anti-join + count distinct) --

@query(
    "parts_supplier_relationship_q16",
    oracle="""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
bad AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT ps.l_suppkey)::BIGINT AS supplier_cnt
FROM ps
JOIN part p ON p.p_partkey = ps.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM bad)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
)
def parts_supplier_relationship_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers serve each (brand,
    type, size) class, excluding a supplier denylist — DISTINCT
    de-duplication, an anti-join (NOT IN with non-null keys ≡ left-anti),
    an IN-list size filter, and COUNT DISTINCT. The part↔supplier relation
    derives from lineitem (no partsupp in the testdata); the denylist is
    negative-balance suppliers. The anti-join side is tiny → broadcast;
    COUNT DISTINCT expands inside the (brand, type, size) aggregate only."""
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


# --- Q20: excess-stock suppliers (nested semi-join) -----------------------

@query(
    "excess_stock_suppliers_q20",
    oracle="""
WITH qty AS (
  SELECT l_partkey, l_suppkey,
         sum(round(l_quantity*100)::BIGINT)::BIGINT AS total_q,
         sum(CASE WHEN l_shipdate >= TIMESTAMP '1999-01-01'
                  THEN round(l_quantity*100)::BIGINT ELSE 0 END)::BIGINT AS recent_q
  FROM lineitem GROUP BY l_partkey, l_suppkey
), hot AS (
  SELECT l_partkey, l_suppkey FROM qty WHERE 2 * recent_q > total_q
), named AS (
  SELECT DISTINCT h.l_suppkey
  FROM hot h
  WHERE h.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
)
SELECT s.s_name, n.n_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE s.s_suppkey IN (SELECT l_suppkey FROM named)
  AND n.n_regionkey = 2
""",
)
def excess_stock_suppliers_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: the NESTED semi-join — suppliers (in one region)
    having a part (matching a name pattern) whose recent shipments exceed
    half their all-time volume. No partsupp/availqty in the testdata, so
    "excess stock" = 1999+ shipments > 50% of total per (part, supplier);
    the plan pattern is intact: innermost IN (part name) → semi-join
    prunes the hot set; outer IN (supplier) → second semi-join prunes
    supplier. Both conditional sums come from ONE aggregate pass over
    lineitem (no second scan); semi-joins never duplicate rows, so no
    DISTINCT cleanup of the outer result is needed."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.round(F.col("l_quantity") * 100).cast("long")
    qty = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(q).alias("total_q"),
        F.sum(
            F.when(
                F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"), q
            ).otherwise(F.lit(0))
        ).alias("recent_q"),
    )
    hot = qty.filter(2 * F.col("recent_q") > F.col("total_q"))
    named_parts = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey")
    named = hot.join(
        named_parts, hot.l_partkey == named_parts.p_partkey, "left_semi"
    ).select("l_suppkey")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    return (
        s.join(named, s.s_suppkey == named.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
    )


# --- Q22: dormant high-balance customers (scalar threshold + anti-join) ---

@query(
    "avg_account_balance_q22",
    oracle="""
WITH pool AS (
  SELECT c_custkey, c_nationkey % 5 AS cntrycode, round(c_acctbal*100)::BIGINT AS bal_cents
  FROM customer WHERE c_nationkey % 5 IN (0, 1, 2)
), pos AS (
  SELECT sum(bal_cents)::BIGINT AS pos_sum, count(*)::BIGINT AS pos_cnt
  FROM pool WHERE bal_cents > 0
)
SELECT p.cntrycode, count(*)::BIGINT AS numcust, sum(p.bal_cents)::BIGINT AS totacctbal_cents
FROM pool p, pos
WHERE p.bal_cents * pos.pos_cnt > pos.pos_sum
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = p.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY p.cntrycode
""",
)
def avg_account_balance_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balances and
    no RECENT orders — a scalar-aggregate threshold (the average, as a
    1-row broadcast) + filtered NOT EXISTS anti-join + grouped rollup. No
    c_phone in the testdata, so country code = c_nationkey % 5; and since
    the generated data gives almost every customer at least one order
    ever, "dormant" = no order since 1999 (the anti-join input is the
    filtered orders scan — same plan shape, non-degenerate result). The
    above-average test is exact integer cross-multiplication (bal·count >
    sum) rather than a float average, so both engines agree at the
    boundary; the 1-row `pos` aggregate broadcasts into a crossJoin (the
    scalar-subquery plan), and the anti-join streams orders keyed on
    custkey."""
    pool = (
        load_table(spark, sf_dir, "customer")
        .filter((F.col("c_nationkey") % 5).isin(0, 1, 2))
        .select(
            "c_custkey",
            (F.col("c_nationkey") % 5).alias("cntrycode"),
            _cents("c_acctbal").alias("bal_cents"),
        )
    )
    pos = pool.filter(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").cast("long").alias("pos_sum"),
        F.count(F.lit(1)).alias("pos_cnt"),
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        pool.crossJoin(F.broadcast(pos))
        .filter(F.col("bal_cents") * F.col("pos_cnt") > F.col("pos_sum"))
        .join(o, pool.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal_cents").cast("long").alias("totacctbal_cents"),
        )
    )
