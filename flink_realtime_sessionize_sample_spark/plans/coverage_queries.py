"""Coverage widening: source-format round-trips, the reference's debug
time-shift, and the remaining relational surface (grouping sets, semi join,
exact percentiles, range-frame windows).

Source-format queries prove the schema-on-read paths (S1/S2 analogs carry
UTF-8 lines; the engine must parse JSON/CSV payloads relationally —
``from_json`` / ``from_csv`` are the Kafka-value decoders in practice).
Their oracles are the *identity projection*: DuckDB computes the expected
output directly from parquet, so a value-hash match proves the Spark
encode→decode round trip is lossless — a stronger check than re-parsing on
the oracle side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_realtime_sessionize_sample_spark.plans.registry import query
from flink_realtime_sessionize_sample_spark.sources.registry import load_table

# --- source formats (S1/S2 payload decoding) ------------------------------

_EVENTS_PROJ_ORACLE = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, round(value, 6) AS value_r
FROM events
"""

_EVENT_WIRE_SCHEMA = "event_id long, user_id long, ts_us long, event_type string, value double"


@query("scan_json_lines", oracle=_EVENTS_PROJ_ORACLE)
def scan_json_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines wire path: encode each event as a JSON string (the Kafka
    value shape), then schema-on-read decode with ``from_json`` and project.
    Identity oracle ⇒ proves the round trip drops nothing. All JVM-side
    (Jackson), one pass, no shuffle."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "event_type", "value"
    )
    wire = ev.select(F.to_json(F.struct(*ev.columns)).alias("line"))
    parsed = wire.select(F.from_json("line", _EVENT_WIRE_SCHEMA).alias("r")).select("r.*")
    return parsed.select(
        "event_id", "user_id", "ts_us", "event_type", F.round("value", 6).alias("value_r")
    )


@query("scan_csv_lines", oracle=_EVENTS_PROJ_ORACLE)
def scan_csv_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV wire path: ``to_csv`` → ``from_csv`` round trip with an explicit
    schema, same identity oracle. The univocity parser runs inside the JVM
    per partition — format decode is scan-parallel, never a shuffle."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "event_type", "value"
    )
    wire = ev.select(F.to_csv(F.struct(*ev.columns)).alias("line"))
    parsed = wire.select(
        F.from_csv("line", F.lit(_EVENT_WIRE_SCHEMA)).alias("r")
    ).select("r.*")
    return parsed.select(
        "event_id", "user_id", "ts_us", "event_type", F.round("value", 6).alias("value_r")
    )


# --- P3: debug timestamp shift --------------------------------------------

_DEBUG_SHIFT_US = 6 * 365 * 24 * 3600 * 1_000_000  # fixed 6-year replay offset


@query(
    "debug_ts_shift",
    oracle=f"""
SELECT event_id, user_id, epoch_us(ts) + {_DEBUG_SHIFT_US} AS shifted_us
FROM events
""",
)
def debug_ts_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 (``Parse.fakeTs``, ``Parse.scala:19-21``): shift every event time
    by a constant so historical logs replay as current. The reference
    computes offset = now() − baseline; a fixed offset keeps the query
    deterministic — the operator (a single column add) is identical."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        (F.unix_micros("ts") + F.lit(_DEBUG_SHIFT_US)).alias("shifted_us"),
    )


# --- grouping sets --------------------------------------------------------


@query(
    "grouping_sets_revenue",
    oracle="""
SELECT n.n_name, o.o_orderpriority,
       sum(round(o.o_totalprice*100)::BIGINT)::BIGINT AS total_cents,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY GROUPING SETS ((n.n_name), (o.o_orderpriority), ())
""",
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the generalization rollup/cube specialize. One
    Expand + single hash aggregate (Catalyst plans the three sets in one
    pass over the join output)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    joined.createOrReplaceTempView("_gs_joined")
    return spark.sql(
        """
        SELECT n_name, o_orderpriority,
               cast(sum(cast(round(o_totalprice*100) as bigint)) as bigint) AS total_cents,
               count(*) AS n_orders
        FROM _gs_joined
        GROUP BY GROUPING SETS ((n_name), (o_orderpriority), ())
        """
    )


# --- semi join ------------------------------------------------------------


@query(
    "orders_with_heavy_items_semi",
    oracle="""
SELECT o.o_orderkey, o.o_orderpriority
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
""",
)
def orders_with_heavy_items_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): orders containing any line with quantity >
    45. Semi joins stop probing on first match and never duplicate the left
    side — strictly cheaper than inner-join + distinct."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_semi").select(
        "o_orderkey", "o_orderpriority"
    )


# --- exact percentiles ----------------------------------------------------


@query(
    "price_percentiles",
    oracle="""
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
       count(*) AS n
FROM orders GROUP BY o_orderpriority
""",
)
def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (linear interpolation — Spark
    ``percentile`` ≙ DuckDB ``quantile_cont``). Exact percentile is a
    sort-based aggregate; at corpus scale prefer ``approx_percentile``
    (t-digest sketch, one pass, mergeable) — see approx_distinct_users for
    the sketch-aggregate pattern."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


# --- skew-resilient aggregation -------------------------------------------


@query(
    "salted_user_event_totals",
    oracle="""
SELECT user_id,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value
FROM events GROUP BY user_id
""",
)
def salted_user_event_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage aggregation (operators/skew.py) hash-checked against
    a plain GROUP BY — proves the skew rewrite is semantics-preserving.
    (float sums are order-sensitive at full precision; 4dp rounding leaves
    ~10 guard digits over any re-association drift)."""
    from flink_realtime_sessionize_sample_spark.operators.skew import salted_aggregate

    ev = load_table(spark, sf_dir, "events")
    out = salted_aggregate(
        ev,
        keys=["user_id"],
        aggs=[
            ("count", "event_id", "n_events"),
            ("sum", "value", "sum_value"),
            ("min", "value", "min_value"),
            ("max", "value", "max_value"),
        ],
        buckets=16,
    )
    return out.select(
        "user_id",
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
    )


# --- range-frame window ---------------------------------------------------


@query(
    "rolling_30d_customer_spend",
    oracle="""
SELECT o_orderkey, o_custkey, d,
       sum(cents) OVER (PARTITION BY o_custkey ORDER BY d
                        RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)::BIGINT AS spend_30d_cents
FROM (
  SELECT o_orderkey, o_custkey,
         date_diff('day', DATE '1970-01-01', o_orderdate)::BIGINT AS d,
         round(o_totalprice*100)::BIGINT AS cents
  FROM orders
)
""",
)
def rolling_30d_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame analytic window: per-customer 30-day rolling spend.
    Value-range frames (vs ROWS) are the time-series primitive; computed on
    integer days-since-epoch via timezone-free date arithmetic (the table's
    TIMESTAMP_NTZ must not pass through a session-timezone-dependent cast)
    so both engines use identical frame bounds."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).cast("long").alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("o_custkey").orderBy("d").rangeBetween(-30, Window.currentRow)
    return o.select(
        "o_orderkey", "o_custkey", "d", F.sum("cents").over(w).alias("spend_30d_cents")
    )


# --- reshaping: pivot / unpivot ------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "pivot_event_type_counts",
    oracle="""
SELECT user_id,
       count(*) FILTER (event_type = 'click')::BIGINT    AS n_click,
       count(*) FILTER (event_type = 'error')::BIGINT    AS n_error,
       count(*) FILTER (event_type = 'purchase')::BIGINT AS n_purchase,
       count(*) FILTER (event_type = 'signup')::BIGINT   AS n_signup,
       count(*) FILTER (event_type = 'view')::BIGINT     AS n_view
FROM events GROUP BY user_id
""",
)
def pivot_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-user event counts spread to one column per event type.
    Explicit pivot values keep the plan a single hash aggregate (no extra
    distinct-values job) and make the output schema static — required for
    both the driver contract and any serious production pipeline. Oracle is
    the conditional-aggregation rewrite, i.e. an independent formulation."""
    ev = load_table(spark, sf_dir, "events")
    out = ev.groupBy("user_id").pivot("event_type", _EVENT_TYPES).count().na.fill(0)
    return out.select(
        "user_id", *[F.col(t).cast("long").alias(f"n_{t}") for t in _EVENT_TYPES]
    )


@query(
    "unpivot_user_value_stats",
    oracle="""
WITH s AS (
  SELECT user_id, min(value) AS v_min, max(value) AS v_max, sum(value) AS v_sum
  FROM events GROUP BY user_id
)
SELECT user_id, stat, round(v, 6) AS v_r FROM (
  SELECT user_id, 'min' AS stat, v_min AS v FROM s
  UNION ALL SELECT user_id, 'max', v_max FROM s
  UNION ALL SELECT user_id, 'sum', v_sum FROM s
)
""",
)
def unpivot_user_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide per-user stats back to long (user_id, stat, v)
    form via ``stack`` — a generator expression, so the reshape is a narrow
    map over the aggregate output, not a join or union of N scans (the
    oracle's UNION ALL over a CTE is the independent formulation)."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy("user_id").agg(
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
        F.sum("value").alias("v_sum"),
    )
    return s.select(
        "user_id",
        F.expr("stack(3, 'min', v_min, 'max', v_max, 'sum', v_sum) AS (stat, v)"),
    ).select("user_id", "stat", F.round("v", 6).alias("v_r"))


# --- correlated scalar subquery (TPC-H Q17 flavor) ------------------------


@query(
    "small_quantity_revenue",
    oracle="""
SELECT p.p_brand,
       count(*)::BIGINT AS n_lines,
       sum(round(l.l_extendedprice * 100)::BIGINT)::BIGINT AS sum_price_cents
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_quantity < (
  SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
)
GROUP BY p.p_brand
""",
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape): lines whose quantity is
    below half the part's average, by brand. Written as actual correlated
    SQL so Catalyst's subquery decorrelation does the rewrite — the planned
    physical form is (per-part avg aggregate) ⋈ lineitem ⋈ part, all
    shuffle-partitioned on partkey, no per-row subquery execution anywhere.
    l_quantity is integer-valued, so the 0.5*avg threshold is exact in both
    engines (integer-sum/count in binary floating point)."""
    for t in ("lineitem", "part"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT p.p_brand,
               count(*) AS n_lines,
               sum(cast(round(l.l_extendedprice * 100) AS BIGINT)) AS sum_price_cents
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_quantity < (
          SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
        )
        GROUP BY p.p_brand
        """
    )


# --- latest-row-per-key (argmax dedup) ------------------------------------


@query(
    "latest_event_per_user",
    oracle="""
SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, round(value, 6) AS value_r
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
""",
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest row per key — the universal CDC/dedup primitive. Implemented
    as a single ``max_by(struct(payload), struct(ts, event_id))`` hash
    aggregate: map-side partial aggregation reduces each partition to one
    candidate row per key BEFORE the shuffle, so the exchange carries |keys|
    rows, not |events| — strictly better at 100 TB than the row_number()
    window (full shuffle + sort) the oracle uses as its independent
    formulation. event_id breaks ts ties deterministically."""
    ev = load_table(spark, sf_dir, "events")
    latest = ev.groupBy("user_id").agg(
        F.max_by(
            F.struct("event_id", "ts", "event_type", "value"),
            F.struct("ts", "event_id"),
        ).alias("r")
    )
    return latest.select(
        "user_id",
        F.col("r.event_id").alias("event_id"),
        F.unix_micros("r.ts").alias("ts_us"),
        F.col("r.event_type").alias("event_type"),
        F.round("r.value", 6).alias("value_r"),
    )


# --- hypertable-style multi-granularity rollup ----------------------------


@query(
    "time_bucket_rollup",
    oracle="""
SELECT epoch_us(date_trunc('day', ts)) AS day_us,
       CASE WHEN GROUPING(date_trunc('hour', ts)) = 0
            THEN epoch_us(date_trunc('hour', ts)) END AS hour_us,
       count(*)::BIGINT AS n_events,
       round(sum(value), 6) AS sum_value_r
FROM events
GROUP BY GROUPING SETS ((date_trunc('day', ts)), (date_trunc('day', ts), date_trunc('hour', ts)))
""",
)
def time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: the same measure at
    hour and day granularity in one pass via GROUPING SETS on truncated
    time buckets (hour_us is NULL on day rows). Spark expands the sets in a
    single Expand+HashAggregate — one scan, one shuffle, both granularities;
    at 100 TB this replaces two separate aggregation jobs and the buckets
    keep the shuffle key cardinality bounded."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        F.date_trunc("day", "ts").alias("d"),
        F.date_trunc("hour", "ts").alias("h"),
        "value",
    )
    out = (
        b.groupingSets([["d"], ["d", "h"]], "d", "h")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value_r"))
    )
    return out.select(
        F.unix_micros("d").alias("day_us"),
        F.unix_micros("h").alias("hour_us"),
        "n_events",
        "sum_value_r",
    )


@query(
    "gap_fill_hourly",
    oracle="""
WITH b AS (
  SELECT user_id, epoch_us(date_trunc('hour', ts)) AS h_us,
         count(*) AS n_events, round(sum(value), 6) AS sum_value_r
  FROM events WHERE user_id < 20 GROUP BY 1, 2
),
spanq AS (
  SELECT user_id, min(h_us) AS lo, max(h_us) AS hi FROM b GROUP BY user_id
),
dense AS (
  SELECT s.user_id, g.h_us
  FROM spanq s, unnest(range(s.lo, s.hi + 1, 3600000000)) AS g(h_us)
)
SELECT d.user_id,
       d.h_us AS hour_us,
       coalesce(b.n_events, 0)::BIGINT AS n_events,
       (b.n_events IS NULL) AS was_gap,
       round(last_value(b.sum_value_r IGNORE NULLS) OVER (
         PARTITION BY d.user_id ORDER BY d.h_us
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS sum_value_locf
FROM dense d LEFT JOIN b ON d.user_id = b.user_id AND d.h_us = b.h_us
""",
)
def gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling (the timescale/hypertable `time_bucket_gapfill`
    capability): densify each user's hourly timeline between their first and
    last event, zero-fill counts, and carry the last observed value forward
    (LOCF) across the gaps.

    Scale shape: the dense timeline is generated per key with
    ``sequence()`` + explode — expansion bounded by span/bucket, never a
    cross join against a global calendar; the LOCF is one running window
    over the already-aggregated (key, bucket) rows, so the raw events
    shuffle exactly once (the hourly aggregate). Keyed to user_id < 20 to
    keep the demo span bounded at any sf."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    b = ev.groupBy(
        "user_id", F.unix_micros(F.date_trunc("hour", "ts")).alias("h_us")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value_r"),
    )
    span = b.groupBy("user_id").agg(F.min("h_us").alias("lo"), F.max("h_us").alias("hi"))
    dense = span.select(
        "user_id",
        F.explode(F.expr("sequence(lo, hi, 3600000000)")).alias("h_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("h_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dense.join(b, ["user_id", "h_us"], "left")
        .select(
            "user_id",
            F.col("h_us").alias("hour_us"),
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.col("n_events").isNull().alias("was_gap"),
            F.round(F.last("sum_value_r", ignorenulls=True).over(w), 6).alias(
                "sum_value_locf"
            ),
        )
    )


# --- analytic ranking family ----------------------------------------------


@query(
    "ranking_family",
    oracle="""
SELECT o_orderkey,
       o_orderpriority,
       row_number()   OVER w AS rn,
       rank()         OVER w AS rnk,
       dense_rank()   OVER w AS drnk,
       ntile(4)       OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist()    OVER w, 6) AS cdist
FROM (SELECT o_orderkey, o_orderpriority,
             cast(floor(o_totalprice / 25000) AS INT) AS price_band
      FROM orders)
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY price_band DESC, o_orderkey)
""",
)
def ranking_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family in one window: row_number / rank /
    dense_rank / ntile / percent_rank / cume_dist over a COARSE price band
    (floor to 25k) so rank vs dense_rank genuinely diverge on ties.
    One window spec → Spark plans a single sort per partition and computes
    all six functions in one pass; at scale the only cost is the shuffle on
    the partition key, shared by all six."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") / 25000).cast("int").alias("price_band"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("price_band"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


# --- Q19-style disjunctive predicate join ---------------------------------

_Q19_PRED_SQL = """
(  (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40) )
"""


@query(
    "disjunctive_brand_revenue",
    oracle=f"""
SELECT p_brand,
       count(*)::BIGINT AS n_lines,
       sum(round(l_extendedprice*100)::BIGINT * (100 - round(l_discount*100)::BIGINT))::BIGINT AS revenue_e4
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE {_Q19_PRED_SQL}
GROUP BY p_brand
""",
)
def disjunctive_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity
    branches across a join. Catalyst extracts the common single-side
    conjuncts from the OR (l_quantity bounds push to the lineitem scan,
    brand/size bounds to the part scan) so the parquet readers skip row
    groups BEFORE the join; the part side is dim-sized → broadcast, making
    the whole query one scan + one broadcast hash join at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).filter(F.expr(_Q19_PRED_SQL))
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(cents * (100 - disc_pct)).alias("revenue_e4"),
    )


# --- Q7-style bilateral shipping volume (6-table join) --------------------


@query(
    "bilateral_shipping_volume",
    oracle="""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       year(l_shipdate) AS ship_year,
       count(*)::BIGINT AS n_lines,
       sum(round(l_extendedprice*100)::BIGINT * (100 - round(l_discount*100)::BIGINT))::BIGINT AS volume_e4
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE n1.n_nationkey < n2.n_nationkey
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
""",
)
def bilateral_shipping_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the biggest join tree in the suite — fact ⋈ fact
    (lineitem ⋈ orders, the one unavoidable shuffle pair) with supplier /
    customer / nation×2 all broadcast. Join order matters at 100 TB: dims
    attach via broadcast (no shuffle), so the plan has exactly ONE shuffle
    exchange pair (orderkey) regardless of how many dimensions enrich the
    row — the snowflake pattern every warehouse query compiles to."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("k1"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("k2"), F.col("n_name").alias("cust_nation"))
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("k1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("k2"))
        .filter(F.col("k1") < F.col("k2"))
    )
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(cents * (100 - disc_pct)).alias("volume_e4"),
    )


# --- higher-order array functions over embeddings -------------------------


@query(
    "embedding_array_stats",
    oracle="""
SELECT vec_id,
       round(sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x))), 4) AS l2_norm_r,
       len(list_filter(embedding, x -> x > 0))::BIGINT AS n_pos,
       round(list_max(list_transform(embedding, x -> abs(x::DOUBLE))), 6) AS max_abs_r,
       round(list_sum(list_transform(embedding, x -> x::DOUBLE)) / len(embedding), 6) + 0.0 AS mean_r
FROM embeddings
""",
)
def embedding_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions — aggregate / filter / transform /
    array_max — as first-class citizens over the embedding column: L2 norm,
    positive-dim count, max |x|, mean. All lambda expressions evaluate
    JVM-side per row with zero explode (no row blowup, no shuffle); both
    engines fold left-to-right over the same array order, so double
    accumulation is bit-identical and the oracle can hash-match."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.round(
            F.sqrt(F.expr(
                "aggregate(embedding, cast(0 as double), (a, x) -> a + cast(x as double) * x)"
            )),
            4,
        ).alias("l2_norm_r"),
        F.expr("size(filter(embedding, x -> x > 0))").cast("long").alias("n_pos"),
        F.round(
            F.expr("array_max(transform(embedding, x -> abs(cast(x as double))))"), 6
        ).alias("max_abs_r"),
        (
            F.round(
                F.expr(
                    "aggregate(embedding, cast(0 as double), (a, x) -> a + cast(x as double))"
                )
                / F.size("embedding"),
                6,
            )
            + F.lit(0.0)  # collapse IEEE -0.0 (near-zero means)
        ).alias("mean_r"),
    )


@query(
    "salted_skew_join",
    oracle="""
WITH dim AS (
  SELECT DISTINCT user_id, user_id % 5 AS segment FROM events
)
SELECT e.event_type, d.segment, count(*) AS n
FROM events e JOIN dim d ON e.user_id = d.user_id
GROUP BY e.event_type, d.segment
""",
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join (operators/skew.py) hash-checked against the plain
    equi join: the left (fact) side is salted over 16 buckets and the dim
    replicated per bucket, so a hot user_id spreads over 16 reducers
    instead of pinning one. The salt never reaches the output — proven by
    the value-hash match with the unsalted oracle."""
    from flink_realtime_sessionize_sample_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events")
    dim = ev.select("user_id").distinct().withColumn(
        "segment", F.col("user_id") % 5
    )
    return (
        salted_join(ev, dim, on=["user_id"], buckets=16)
        .groupBy("event_type", "segment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- Z-order (Morton) multi-dimensional clustering key --------------------

@query(
    "zorder_cluster_stats",
    oracle="""
WITH base AS (
  SELECT o_orderkey,
         (o_custkey % 65536)::BIGINT AS x,
         datediff('day', DATE '1992-01-01', o_orderdate::DATE)::BIGINT AS y
  FROM orders
), keyed AS (
  SELECT b.o_orderkey, b.x, b.y,
         sum((((b.x >> r.i) & 1) << (2 * r.i))
             + (((b.y >> r.i) & 1) << (2 * r.i + 1)))::BIGINT AS zkey
  FROM base b, range(0, 16) r(i)
  GROUP BY b.o_orderkey, b.x, b.y
)
SELECT (zkey >> 16)::BIGINT AS zbucket,
       count(*)::BIGINT AS n_orders,
       min(x)::BIGINT AS min_x, max(x)::BIGINT AS max_x,
       min(y)::BIGINT AS min_y, max(y)::BIGINT AS max_y
FROM keyed
GROUP BY 1
""",
)
def zorder_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key for multi-dimensional data layout —
    what Delta/Iceberg `OPTIMIZE ZORDER BY` computes so min/max file stats
    prune on BOTH dimensions (Morton 1966; interleaved-bit space-filling
    curve).

    A single-column range partition clusters one dimension and scatters
    the other; interleaving the bits of (customer, order-day) into one
    key makes every contiguous key range a bounded rectangle in (x, y)
    space. The query materializes that property as the product: per
    65536-key z-bucket (top 16 of 32 bits), the count plus the min/max of
    each raw dimension — the exact file-skipping statistics a layout
    optimizer would write. At 100 TB the full recipe is
    ``repartitionByRange(zkey).sortWithinPartitions(zkey)`` + parquet
    min/max stats; the key itself is a pure per-row codegen expression
    (``aggregate`` over 16 bit positions — no UDF, no shuffle), so the
    only exchange is whatever the writer's range partitioning needs.
    Dimensions are quantized to 16 bits (custkey mod 2^16; day offset from
    the epoch of the dataset) — the standard truncate-to-prefix step.
    """
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.pmod(F.col("o_custkey"), F.lit(65536)).cast("long").alias("x"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("long")
        .alias("y"),
    )
    keyed = base.withColumn(
        "zkey",
        F.expr(
            "aggregate(sequence(0, 15), cast(0 as bigint), (acc, i) ->"
            " acc + shiftleft(shiftright(x, i) & 1, 2 * i)"
            "     + shiftleft(shiftright(y, i) & 1, 2 * i + 1))"
        ),
    )
    return (
        keyed.select(F.shiftright("zkey", 16).alias("zbucket"), "x", "y")
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
    )
