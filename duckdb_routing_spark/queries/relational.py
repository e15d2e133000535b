"""The relational workload: TPC-H-shaped analytics over the star schema plus
the `events` behavioral table — the host-SQL capability envelope the
reference's own examples exercise (SURVEY §2.4: scans, joins incl.
semi/anti/lateral-shaped fan-outs, aggregation, windows, rollup, pivot,
set ops, CTEs, JSON, sort/limit).

Implementation style: flagship queries use the DataFrame API (to keep the
plan shape explicit — broadcast hints, pushdown-friendly scans); the rest are
Spark SQL. Every query has a DuckDB oracle.

Float-parity policy (the driver hash-compares values bit-for-bit):
  - NEVER round() an aggregate: Spark's round is HALF_UP on the double's
    shortest decimal string while DuckDB rounds the double's exact value —
    they disagree whenever the true result lands on a .5 boundary, which is
    common for data generated with 2 decimals.
  - Instead, cast each row's expression to DECIMAL before summing (the
    fixture's money values are exact at <= 6 decimals, so the cast is exact),
    sum exactly, and cast the result to DOUBLE — bit-identical across engines.
  - Averages/ratios = exact decimal sum cast to double, divided by an exact
    count — one deterministic IEEE division.
  - Raw (untransformed) columns pass through bit-identically; no handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_routing_spark.queries.registry import bytes_scaled_shuffle, register, table


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        table(spark, sf_dir, n).createOrReplaceTempView(n)


def dsum(expr: str, scale: int = 4) -> str:
    """Exact money sum as SQL text (identical in Spark and DuckDB dialects)."""
    return f"cast(sum(cast({expr} as decimal(18,{scale}))) as double)"


def dsum_col(col, scale: int = 4):
    """Exact money sum as a Column (DataFrame API twin of dsum)."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


# ---------------------------------------------------------------------------
# TPC-H-shaped (adapted to the driver fixture's columns)
# ---------------------------------------------------------------------------

Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {dsum('l_quantity', 2)}                                              AS sum_qty,
       {dsum('l_extendedprice', 2)}                                         AS sum_base_price,
       {dsum('l_extendedprice * (1 - l_discount)', 4)}                      AS sum_disc_price,
       {dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)}        AS sum_charge,
       {dsum('l_quantity', 2)} / count(*)                                   AS avg_qty,
       {dsum('l_extendedprice', 2)} / count(*)                              AS avg_price,
       {dsum('l_discount', 2)} / count(*)                                   AS avg_disc,
       count(*)                                                             AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=Q1_ORACLE, headline=True, doc="TPC-H Q1 pricing summary report",
          session_conf=bytes_scaled_shuffle("lineitem"))
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count("*")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum_col(F.col("l_quantity"), 2).alias("sum_qty"),
            dsum_col(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            dsum_col(disc_price, 4).alias("sum_disc_price"),
            dsum_col(charge, 6).alias("sum_charge"),
            (dsum_col(F.col("l_quantity"), 2) / n).alias("avg_qty"),
            (dsum_col(F.col("l_extendedprice"), 2) / n).alias("avg_price"),
            (dsum_col(F.col("l_discount"), 2) / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q3_ORACLE = f"""
SELECT l_orderkey,
       {dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", oracle=Q3_ORACLE, headline=True, doc="TPC-H Q3 shipping priority",
          session_conf=bytes_scaled_shuffle("lineitem", "orders", "customer",
                                            bytes_per_partition=16 << 20))
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer is the small side: broadcast it instead of shuffling lineitem
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum_col(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("q4_order_priority", oracle=Q4_ORACLE, doc="TPC-H Q4: EXISTS as left-semi join")
def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    late = orders.join(
        li, (li.l_orderkey == orders.o_orderkey) & (li.l_shipdate > orders.o_orderdate), "left_semi"
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count")).orderBy("o_orderpriority")


Q5_ORACLE = f"""
SELECT n_name, {dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@register("q5_local_supplier", oracle=Q5_ORACLE, headline=True, doc="TPC-H Q5 local supplier volume",
          session_conf=bytes_scaled_shuffle("lineitem", "orders", "customer", "supplier", "nation", "region"))
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DataFrame form with lineitem as the probe: under the literal SQL join
    # order Catalyst's static size estimates picked lineitem (the fact
    # table) as a broadcast BUILD side — fatal at scale and the single
    # biggest cost at bench scale (600k-row hash relation). With lineitem
    # leftmost every other input is the build side, chosen broadcast-or-SMJ
    # by the threshold, which stays correct at any volume.
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum_col(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q6_ORACLE = f"""
SELECT {dsum('l_extendedprice * l_discount', 4)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


@register("q6_revenue_forecast", oracle=Q6_ORACLE, headline=True, doc="TPC-H Q6 forecast revenue change",
          session_conf=bytes_scaled_shuffle("lineitem"))
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(dsum_col(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"))


Q10_ORACLE = f"""
SELECT c_custkey, c_name,
       {dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", oracle=Q10_ORACLE, headline=True, doc="TPC-H Q10 returned item reporting",
          session_conf=bytes_scaled_shuffle("lineitem", "orders", "customer", "nation"))
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lineitem-as-probe DataFrame form (see q5): the SQL join order made
    # Catalyst broadcast-build the filtered fact table
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum_col(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q14_ORACLE = f"""
SELECT 100.00 * {dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 4)}
             / {dsum('l_extendedprice * (1 - l_discount)', 4)} AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
"""


@register("q14_promo_effect", oracle=Q14_ORACLE, doc="TPC-H Q14 promotion effect")
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    part = table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * dsum_col(F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0), 4)
                / dsum_col(disc, 4)
            ).alias("promo_revenue_pct")
        )
    )


Q18_ORACLE = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       {dsum('l_quantity', 2)} AS sum_qty
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING sum(cast(l_quantity as decimal(18,2))) > 150
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@register("q18_large_orders", oracle=Q18_ORACLE, doc="TPC-H Q18 large volume customers")
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(Q18_ORACLE)


ROLLUP_ORACLE = f"""
SELECT coalesce(r_name, 'ALL')  AS region_name,
       coalesce(n_name, 'ALL')  AS nation_name,
       cast(grouping(r_name) AS INT) + cast(grouping(n_name) AS INT) AS lvl,
       {dsum('o_totalprice', 2)} AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY lvl, region_name, nation_name
"""


@register("rollup_revenue", oracle=ROLLUP_ORACLE, doc="ROLLUP region/nation with GROUPING")
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "customer", "nation", "region")
    return spark.sql(ROLLUP_ORACLE)


TOPK_ORACLE = """
SELECT c_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT c_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY c_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM customer JOIN orders ON c_custkey = o_custkey
) t
WHERE rn <= 3
ORDER BY c_custkey, rn
"""


@register("window_topk_orders", oracle=TOPK_ORACLE, headline=True, doc="top-3 orders per customer (window)",
          session_conf=bytes_scaled_shuffle("orders", "customer",
                                            bytes_per_partition=4 << 20))
def window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(TOPK_ORACLE)


RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey,
       cast(sum(cast(o_totalprice as decimal(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double) AS running_total
FROM orders
ORDER BY o_custkey, o_orderkey
"""


@register("window_running_total", oracle=RUNNING_ORACLE, doc="running revenue per customer (window frame)")
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(RUNNING_ORACLE)


ANTI_ORACLE = """
SELECT n_name, count(*) AS n_quiet_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY n_name
ORDER BY n_quiet_customers DESC, n_name
"""


@register("anti_join_quiet_customers", oracle=ANTI_ORACLE, doc="NOT EXISTS as left-anti join")
def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    urgent = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    nation = table(spark, sf_dir, "nation")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_quiet_customers"))
        .orderBy(F.desc("n_quiet_customers"), "n_name")
    )


SEGMENT_ORACLE = f"""
SELECT c_mktsegment,
       count(*) AS n_customers,
       count(DISTINCT c_nationkey) AS n_nations,
       {dsum('c_acctbal', 2)} / count(*) AS avg_acctbal,
       min(c_acctbal) AS min_acctbal,
       max(c_acctbal) AS max_acctbal
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register("segment_stats", oracle=SEGMENT_ORACLE, doc="per-segment stats incl. count distinct")
def segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer")
    return spark.sql(SEGMENT_ORACLE)


PIVOT_ORACLE = """
SELECT o_orderpriority,
       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS status_O,
       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS status_F,
       count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS status_P
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("pivot_order_status", oracle=PIVOT_ORACLE, doc="pivot order status to columns")
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .na.fill(0, ["O", "F", "P"])
        .select(
            "o_orderpriority",
            F.col("O").alias("status_O"),
            F.col("F").alias("status_F"),
            F.col("P").alias("status_P"),
        )
        .orderBy("o_orderpriority")
    )


UNION_ORACLE = """
SELECT 'high_value' AS bucket, count(*) AS n FROM orders WHERE o_totalprice > 300000
UNION ALL
SELECT 'low_value' AS bucket, count(*) AS n FROM orders WHERE o_totalprice <= 300000
ORDER BY bucket
"""


@register("union_buckets", oracle=UNION_ORACLE, doc="UNION ALL set op")
def union_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(UNION_ORACLE)


CTE_ORACLE = """
WITH nation_rev AS (
  SELECT n_name, sum(cast(o_totalprice as decimal(18,2))) AS rev_dec
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name, cast(rev_dec as double) AS revenue,
       cast(rev_dec as double) / cast(sum(rev_dec) OVER () as double) AS rev_share
FROM nation_rev
ORDER BY revenue DESC, n_name
"""
# rev_share stays unrounded because BOTH operands come from exact decimal
# sums (the window total is summed in decimal, not double, so addition order
# can't shift it by an ulp); the final division is one deterministic IEEE op.


@register("cte_revenue_share", oracle=CTE_ORACLE, doc="CTE + global window share-of-total")
def cte_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "customer", "nation")
    return spark.sql(CTE_ORACLE)


# ---------------------------------------------------------------------------
# events: behavioral/time-series analytics
# ---------------------------------------------------------------------------

EVENTS_HOURLY_SPARK = f"""
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events,
       {dsum('value', 6)} AS total_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""
EVENTS_HOURLY_ORACLE = EVENTS_HOURLY_SPARK.replace(
    "date_trunc('hour', ts)", "date_trunc('hour', cast(ts as timestamp))"
)


@register("events_hourly", oracle=EVENTS_HOURLY_ORACLE, headline=True,
          doc="tumbling-hour event aggregation",
          session_conf=bytes_scaled_shuffle("events"))
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "events")
    return spark.sql(EVENTS_HOURLY_SPARK)


_FUNNEL_STEPS = ["view", "click", "purchase"]
EVENTS_FUNNEL_ORACLE = """
WITH e AS (SELECT user_id AS u, event_type AS et, epoch_us(cast(ts AS TIMESTAMP)) AS us FROM events),
s0 AS (SELECT u, min(us) AS t0 FROM e WHERE et = 'view' GROUP BY u),
s1 AS (SELECT e.u, min(us) AS t1 FROM e JOIN s0 USING(u) WHERE et = 'click' AND us > t0 GROUP BY e.u),
s2 AS (SELECT e.u, min(us) AS t2 FROM e JOIN s1 USING(u) WHERE et = 'purchase' AND us > t1 GROUP BY e.u),
c AS (SELECT (SELECT count(*) FROM s0) AS n0, (SELECT count(*) FROM s1) AS n1,
             (SELECT count(*) FROM s2) AS n2)
SELECT 'view' AS step, 0 AS step_index, n0 AS n_users,
       1.0 AS pct_of_first, 1.0 AS pct_of_prev FROM c
UNION ALL SELECT 'click', 1, n1, n1::DOUBLE / n0, n1::DOUBLE / n0 FROM c
UNION ALL SELECT 'purchase', 2, n2, n2::DOUBLE / n0, n2::DOUBLE / n1 FROM c
ORDER BY step_index
"""


@register("events_funnel", oracle=EVENTS_FUNNEL_ORACLE,
          doc="ordered funnel view->click->purchase: first-touch chained min-ts, per-step conversion")
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel conversion (operators/funnel.py): step i counts users
    with an s_i event strictly after their first completion of step i-1 —
    chained user-keyed min aggregations, no per-user event history held
    anywhere."""
    from duckdb_routing_spark.operators.funnel import funnel_conversion

    return funnel_conversion(table(spark, sf_dir, "events"), _FUNNEL_STEPS).orderBy("step_index")


EVENTS_COHORTS_ORACLE = """
WITH e AS (SELECT user_id AS u, cast(ts AS TIMESTAMP)::DATE AS d FROM events),
f AS (SELECT u, min(d) AS first_d FROM e GROUP BY u),
c AS (SELECT u, first_d - dayofweek(first_d)::INT AS cohort FROM f),
a AS (SELECT DISTINCT cohort, ((d - cohort) // 7)::INT AS period_offset, u
      FROM e JOIN c USING (u)),
s AS (SELECT cohort, count(*) AS n_cohort FROM c GROUP BY cohort)
SELECT strftime(a.cohort, '%Y-%m-%d') AS cohort, period_offset,
       count(*) AS n_active, s.n_cohort,
       count(*)::DOUBLE / s.n_cohort AS retention
FROM a JOIN s USING (cohort)
GROUP BY a.cohort, period_offset, s.n_cohort
ORDER BY cohort, period_offset
"""


@register("events_cohorts", oracle=EVENTS_COHORTS_ORACLE,
          doc="weekly cohort retention: acquisition week -> fraction active k weeks later")
def events_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention (operators/cohorts.py): Sunday-start weekly cohorts
    by first event; retention = distinct active users at week offset k over
    cohort size — user-keyed aggregations only, no per-user history."""
    from duckdb_routing_spark.operators.cohorts import cohort_retention

    out = cohort_retention(table(spark, sf_dir, "events"), period="week")
    # DATE -> ISO string for the cross-engine hash (pandas renders DuckDB
    # DATE as datetime64 but Spark DateType as date objects)
    return out.withColumn("cohort", F.date_format("cohort", "yyyy-MM-dd")).orderBy(
        "cohort", "period_offset"
    )


EVENTS_JSON_SPARK = """
SELECT event_type,
       cast(sum(cast(get_json_object(props, '$.k') AS DECIMAL(18,2))) as double)
         / count(get_json_object(props, '$.k')) AS avg_k,
       count(CASE WHEN get_json_object(props, '$.k') IS NULL THEN 1 END) AS n_missing
FROM events
GROUP BY event_type
ORDER BY event_type
"""
EVENTS_JSON_ORACLE = EVENTS_JSON_SPARK.replace("get_json_object", "json_extract_string")


@register("events_json_extract", oracle=EVENTS_JSON_ORACLE, doc="JSON prop extraction + aggregation")
def events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "events")
    return spark.sql(EVENTS_JSON_SPARK)


def _sessionize_sql(epoch_us: str, ts_cast: str) -> str:
    return f"""
WITH seq AS (
  SELECT user_id, ts, event_id,
         CASE WHEN {epoch_us} - lag({epoch_us}) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > 1800000000
                OR lag({ts_cast}) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, event_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM seq
)
SELECT user_id,
       cast(max(session_id) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM sessions
GROUP BY user_id
ORDER BY user_id
"""


EVENTS_SESSION_SPARK = _sessionize_sql("unix_micros(ts)", "ts")
EVENTS_SESSION_ORACLE = _sessionize_sql("epoch_us(cast(ts as timestamp))", "cast(ts as timestamp)")


@register("events_sessionize", oracle=EVENTS_SESSION_ORACLE, headline=True,
          doc="30-min-gap sessionization via windows",
          session_conf=bytes_scaled_shuffle("events"))
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "events")
    return spark.sql(EVENTS_SESSION_SPARK)


def _session_stats_sql(epoch_us: str, ts_cast: str) -> str:
    """Per-session rollup downstream of the 30-min-gap islands: duration,
    depth, and distinct event types per (user, session)."""
    return f"""
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN {epoch_us} - lag({epoch_us}) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > 1800000000
                OR lag({ts_cast}) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, event_id, event_type, {epoch_us} AS us,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM seq
)
SELECT user_id, cast(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       count(DISTINCT event_type) AS n_event_types,
       cast(max(us) - min(us) AS BIGINT) AS duration_us
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


SESSION_STATS_SPARK = _session_stats_sql("unix_micros(ts)", "ts")
SESSION_STATS_ORACLE = _session_stats_sql("epoch_us(cast(ts as timestamp))", "cast(ts as timestamp)")


@register("events_session_stats", oracle=SESSION_STATS_ORACLE,
          doc="per-session rollup: events, distinct types, duration per 30-min-gap session")
def events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The session-level fact table downstream of sessionization — depth,
    diversity, and exact microsecond duration per (user, session) island.
    Same single user-keyed window chain as events_sessionize; the rollup
    reuses its partitioning."""
    _views(spark, sf_dir, "events")
    return spark.sql(SESSION_STATS_SPARK)


# ---------------------------------------------------------------------------
# additional TPC-H shapes + as-of join
# ---------------------------------------------------------------------------

Q7_ORACLE = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       cast(year(l_shipdate) AS INT) AS l_year,
       {dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
WHERE sn.n_name != cn.n_name
GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
"""


EVENTS_OUTLIERS_ORACLE = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS median_v
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type, med.median_v,
         quantile_cont(abs(e.value - med.median_v), 0.5) AS mad_v
  FROM events e JOIN med USING (event_type)
  GROUP BY e.event_type, med.median_v
)
SELECT m.event_type, m.median_v, m.mad_v,
       count(*) FILTER (
         WHERE abs(e.value - m.median_v) > 3 * 1.4826 * m.mad_v
       ) AS n_outliers,
       count(*) AS n_events
FROM events e JOIN mad m USING (event_type)
GROUP BY m.event_type, m.median_v, m.mad_v
ORDER BY m.event_type
"""


@register("events_outlier_bounds", oracle=EVENTS_OUTLIERS_ORACLE,
          doc="robust outlier detection per event type: median/MAD bounds + outlier counts")
def events_outlier_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-QA shape: median + median-absolute-deviation per group (robust
    to the outliers it hunts), then count beyond median ± 3·1.4826·MAD.
    Spark's percentile() interpolates identically to DuckDB's
    quantile_cont (proven by percentiles_by_priority), so even the float
    bounds hash-match. Two grouped passes + one broadcast-joined count —
    no sort of the full table."""
    ev = table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("median_v"))
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "median_v")
        .agg(F.expr("percentile(abs(value - median_v), 0.5)").alias("mad_v"))
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "median_v", "mad_v")
        .agg(
            F.count(
                F.when(F.abs(F.col("value") - F.col("median_v")) > 3 * 1.4826 * F.col("mad_v"), 1)
            ).alias("n_outliers"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


EVENTS_TRANSITIONS_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, count(*) AS n
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
ORDER BY n DESC, prev_type, next_type
LIMIT 20
"""


@register("events_transitions", oracle=EVENTS_TRANSITIONS_ORACLE,
          doc="event-sequence mining: top-20 event-type transition bigrams across user journeys")
def events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The markov-chain view of user journeys (what follows what): one
    user-keyed window for the lag, one keyed groupBy for the counts, a
    bounded top-20. Tie-break on event_id makes simultaneous events
    deterministic, so the count table hash-matches."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w))
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "prev_type", "next_type")
        .limit(20)
    )


@register("q7_nation_volume", oracle=Q7_ORACLE, doc="TPC-H Q7 cross-nation shipping volume")
def q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "supplier", "orders", "customer", "nation")
    return spark.sql(Q7_ORACLE)


Q8_ORACLE = f"""
WITH sales AS (
  SELECT cast(year(o_orderdate) AS INT) AS o_year,
         r_name,
         cast(l_extendedprice * (1 - l_discount) as decimal(18,4)) AS volume
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation   ON n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = n_regionkey
)
SELECT o_year,
       cast(sum(CASE WHEN r_name = 'ASIA' THEN volume ELSE cast(0 as decimal(18,4)) END) as double)
         / cast(sum(volume) as double) AS asia_share
FROM sales
GROUP BY o_year
ORDER BY o_year
"""


@register("q8_market_share", oracle=Q8_ORACLE, doc="TPC-H Q8-style market share per year")
def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "orders", "customer", "nation", "region")
    return spark.sql(Q8_ORACLE)


Q9_ORACLE = f"""
SELECT n_name AS nation, cast(year(o_orderdate) AS INT) AS o_year,
       {dsum('l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.1', 4)} AS profit_proxy
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON n_nationkey = s_nationkey
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""


@register("q9_profit_proxy", oracle=Q9_ORACLE, doc="TPC-H Q9-style profit by supplier nation and year")
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "part", "supplier", "orders", "nation")
    return spark.sql(Q9_ORACLE)


Q19_ORACLE = f"""
SELECT {dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
   OR (p_type = 'PROMO' AND p_size BETWEEN 1 AND 50 AND l_quantity >= 5)
"""


@register("q19_disjunctive_predicates", oracle=Q19_ORACLE, doc="TPC-H Q19-style disjunctive join predicates")
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(Q19_ORACLE)


Q22_ORACLE = """
WITH avg_bal AS (
  SELECT cast(sum(cast(c_acctbal as decimal(18,2))) as double) / count(*) AS a
  FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment, count(*) AS n_rich_dormant,
       cast(sum(cast(c_acctbal as decimal(18,2))) as double) AS total_bal
FROM customer, avg_bal
WHERE c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register("q22_dormant_rich", oracle=Q22_ORACLE, doc="TPC-H Q22-style scalar subquery + anti join")
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(Q22_ORACLE)


GROUPING_SETS_ORACLE = f"""
SELECT coalesce(r_name, 'ALL') AS region_name,
       coalesce(c_mktsegment, 'ALL') AS segment,
       cast(grouping(r_name) AS INT) AS g_region,
       cast(grouping(c_mktsegment) AS INT) AS g_segment,
       {dsum('o_totalprice', 2)} AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name), (c_mktsegment), ())
ORDER BY g_region, g_segment, region_name, segment
"""


@register("grouping_sets_revenue", oracle=GROUPING_SETS_ORACLE, doc="GROUPING SETS over region/segment")
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "customer", "nation", "region")
    return spark.sql(GROUPING_SETS_ORACLE)


ASOF_ORACLE = """
SELECT p.event_id, p.user_id, p.value,
       (SELECT v.value FROM events v
        WHERE v.user_id = p.user_id AND v.event_type = 'view'
          AND v.ts <= p.ts
        ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS asof_value
FROM events p
WHERE p.event_type = 'purchase'
ORDER BY p.event_id
"""


@register("asof_purchase_last_view", oracle=ASOF_ORACLE, doc="as-of join: each purchase joined to the latest prior view")
def asof_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_routing_spark.operators.asof import asof_join_backward

    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts", "value")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id", "value")
    out = asof_join_backward(purchases, views, on="ts", by="user_id", value_cols=["value"], seq_col="event_id")
    return out.select("event_id", "user_id", "value", F.col("asof_value")).orderBy("event_id")


ASOF_TOL_ORACLE = """
SELECT p.event_id, p.user_id, p.value,
       (SELECT v.value FROM events v
        WHERE v.user_id = p.user_id AND v.event_type = 'view'
          AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
        ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS asof_value
FROM events p
WHERE p.event_type = 'purchase'
ORDER BY p.event_id
"""


@register("asof_view_within_hour", oracle=ASOF_TOL_ORACLE,
          doc="as-of join with tolerance: latest prior view, but only within 1 hour")
def asof_tol_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """merge_asof-style tolerance: stale matches (prior view older than the
    bound) yield NULL instead of a far-past carry — a row-local mask on the
    carried struct's own timestamp, same single shuffle as the plain as-of."""
    from duckdb_routing_spark.operators.asof import asof_join_backward

    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts", "value")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id", "value")
    out = asof_join_backward(
        purchases, views, on="ts", by="user_id", value_cols=["value"],
        seq_col="event_id", tolerance_s=3600.0,
    )
    return out.select("event_id", "user_id", "value", F.col("asof_value")).orderBy("event_id")


PERCENTILE_ORACLE = """
SELECT o_orderpriority,
       quantile_cont(o_totalprice, 0.5) AS median_price,
       quantile_cont(o_totalprice, 0.9) AS p90_price,
       quantile_cont(o_totalprice, 0.99) AS p99_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""
PERCENTILE_SPARK = PERCENTILE_ORACLE.replace("quantile_cont(o_totalprice,", "percentile(o_totalprice,")


@register("percentiles_by_priority", oracle=PERCENTILE_ORACLE, doc="exact interpolated percentiles (Spark percentile == DuckDB quantile_cont)")
def percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(PERCENTILE_SPARK)


# ---------------------------------------------------------------------------
# Decision-support shapes rounding out the TPC-H operator envelope
# (adapted to the fixture's columns like the rest of this file; all
# pytest-oracled, DRIVER_HIDDEN — each is a strict operator-shape variant
# of an exposed sibling family)
# ---------------------------------------------------------------------------

Q11_ORACLE = f"""
SELECT l_partkey, {dsum('l_extendedprice * (1 - l_discount)', 4)} AS part_value
FROM lineitem
GROUP BY l_partkey
HAVING sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,4)))
     > (SELECT sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,4))) * 0.0002
        FROM lineitem)
ORDER BY part_value DESC, l_partkey
"""


@register("q11_important_stock", oracle=Q11_ORACLE,
          doc="TPC-H Q11 shape: HAVING against an uncorrelated global scalar subquery")
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark plans the scalar subquery as its own stage and folds the result
    into the HAVING filter; the fact table is scanned twice (once per agg) —
    at cluster scale both scans prune to the 3 referenced columns."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(Q11_ORACLE)


Q13_ORACLE = """
SELECT n_orders, count(*) AS n_customers
FROM (
  SELECT c_custkey, count(o_orderkey) AS n_orders
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) per_cust
GROUP BY n_orders
ORDER BY n_customers DESC, n_orders DESC
"""


@register("q13_order_histogram", oracle=Q13_ORACLE,
          doc="TPC-H Q13 shape: outer join with join-level predicate -> two-level count histogram")
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame form: the filter lives in the JOIN condition (not WHERE —
    on an outer join those differ), then two cascaded counts. customer side
    broadcasts; the orders scan prunes to (o_custkey, o_orderpriority)."""
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey")) & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count("*").alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


Q16_ORACLE = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#3'
  AND p_size IN (1, 4, 9, 14, 19, 24)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register("q16_supplier_variety", oracle=Q16_ORACLE,
          doc="TPC-H Q16 shape: NOT IN anti-subquery + count(DISTINCT) over a 3-key group")
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a non-nullable key plans as a broadcast null-aware anti
    join (the 6-row exclusion set ships to every task); count(DISTINCT)
    expands to a two-phase aggregate. Identical ANSI text in both engines."""
    _views(spark, sf_dir, "lineitem", "part", "supplier")
    return spark.sql(Q16_ORACLE)


Q17_ORACLE = f"""
SELECT {dsum('l_extendedprice', 2)} / 7.0 AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#5'
  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
"""


@register("q17_small_quantity_revenue", oracle=Q17_ORACLE,
          doc="TPC-H Q17 shape: correlated scalar AVG subquery per part")
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst de-correlates the scalar subquery into an aggregate-then-join
    (per-part avg joined back on p_partkey) — the same rewrite every MPP
    engine applies; no per-row re-execution. avg(l_quantity) is DOUBLE in
    both engines over the same operands (deterministic IEEE sum order after
    the de-correlation groups per part), and the 0.2* threshold comparison
    is exact-identical."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(Q17_ORACLE)


Q21_ORACLE = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders    ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


@register("q21_sole_blame", oracle=Q21_ORACLE,
          doc="TPC-H Q21 shape: correlated EXISTS + NOT EXISTS on the same fact table")
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The blame query: suppliers alone at fault in multi-supplier orders.
    Spark plans the EXISTS as a left-semi and the NOT EXISTS as a left-anti
    join against the same lineitem scan (reused exchange), keyed on
    l_orderkey — two shuffles over the fact table, no per-row subquery."""
    _views(spark, sf_dir, "supplier", "lineitem", "orders")
    return spark.sql(Q21_ORACLE)


BLOOM_SEMI_ORACLE = f"""
SELECT count(*) AS n_items, {dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
"""


@register("bloom_semi_revenue", oracle=BLOOM_SEMI_ORACLE,
          doc="Bloom-pruned semi join: lineitem ⋉ urgent orders, result-identical to the plain semi join")
def bloom_semi_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter pattern (operators/bloom.py): the urgent-order key set
    builds a distributed Bloom bitmap, the probe side is pre-filtered by a
    vectorized bitmap UDF BEFORE the join shuffle, and the exact semi join
    over survivors makes the result byte-identical to the oracle's IN.
    Worth it when the build side exceeds the broadcast threshold but its
    bitmap (n_bits/8 bytes) does not."""
    from duckdb_routing_spark.operators.bloom import bloom_semi_join

    li = table(spark, sf_dir, "lineitem")
    urgent = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey")
    )
    joined = bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey")
    return joined.agg(
        F.count("*").alias("n_items"),
        dsum_col(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
    )


# With q2/q12/q15/q20 below, every one of the 22 TPC-H operator shapes has an
# oracled adaptation in this file (the fixture has no partsupp table, so the
# partsupp-dependent queries rebind their association through lineitem — the
# operator shape under test is unchanged).

Q2_ORACLE = """
SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
       l_extendedprice / l_quantity AS unit_cost
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE' AND p_size = 9
  AND l_extendedprice / l_quantity = (
    SELECT min(l2.l_extendedprice / l2.l_quantity)
    FROM lineitem l2
    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
"""


@register("q2_min_cost_supplier", oracle=Q2_ORACLE,
          doc="TPC-H Q2 shape: correlated scalar MIN subquery over a 4-table join, per part")
def q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The min-cost-supplier shape (partsupp rebound through lineitem:
    unit_cost = l_extendedprice / l_quantity). Catalyst de-correlates the
    scalar MIN into a per-part aggregate joined back on p_partkey — the
    region/nation dims broadcast into both branches. Float parity: unit_cost
    is ONE IEEE division on identical doubles and min() is order-independent,
    so the equality predicate and the output column are bit-identical across
    engines."""
    _views(spark, sf_dir, "part", "lineitem", "supplier", "nation", "region")
    return spark.sql(Q2_ORACLE)


Q12_ORACLE = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("q12_priority_shipping", oracle=Q12_ORACLE,
          doc="TPC-H Q12 shape: conditional two-way counts (CASE inside SUM) after a fact-dim join")
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority split (l_returnflag stands in for the fixture's
    missing l_shipmode). The date filter pushes to the lineitem scan before
    the join; both CASE counters fold in the same partial aggregate — one
    shuffle on the 3-row group key. Integer counts: parity-exact."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(Q12_ORACLE)


Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,4))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, cast(total_revenue as double) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@register("q15_top_supplier", oracle=Q15_ORACLE,
          doc="TPC-H Q15 shape: revenue view reused twice — top supplier via MAX scalar subquery")
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The top-supplier view shape: the same quarterly revenue CTE feeds both
    the join and the MAX scalar subquery (Spark evaluates the CTE per
    reference; at scale, persist the revenue view to scan lineitem once).
    The equality filter compares exact DECIMAL sums — no float ties — and
    only the final output casts to double."""
    _views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(Q15_ORACLE)


Q20_ORACLE = """
SELECT s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name LIKE 'NATION_1%'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red %')
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(cast(l_quantity as decimal(18,2))) > 40)
ORDER BY s_name
"""


RECURSIVE_SPINE_SPARK = """
WITH RECURSIVE spine(d) AS (
  SELECT DATE '1995-01-01'
  UNION ALL
  SELECT d + INTERVAL 1 DAY FROM spine WHERE d < DATE '1995-03-01'
),
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
)
SELECT CAST(s.d AS STRING) AS day, coalesce(n, 0) AS n_orders
FROM spine s LEFT JOIN daily ON daily.d = s.d
ORDER BY day
"""
# identical ANSI text both engines except the string type spelling
RECURSIVE_SPINE_ORACLE = RECURSIVE_SPINE_SPARK.replace("AS STRING", "AS VARCHAR")


@register("recursive_date_spine", oracle=RECURSIVE_SPINE_ORACLE,
          doc="WITH RECURSIVE calendar spine (Spark 4 recursive CTE) zero-filling daily order counts")
def recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-SQL recursive CTE, executed BY SPARK (4.x UnionLoop — each
    iteration is one distributed step off the previous frame; the engine
    bounds depth via spark.sql.cteRecursionLevelLimit): the calendar-spine
    warehouse pattern — generate every day in the window, left-join the
    aggregated fact so zero-activity days appear explicitly. The DuckDB
    oracle runs the same text (VARCHAR for STRING)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(RECURSIVE_SPINE_SPARK)


def _profile_col_sql(c: str, kind: str) -> str:
    """One UNION ALL arm of the DuckDB profile oracle for column c."""
    if kind == "num":
        mn, mx = f"min({c})::DOUBLE", f"max({c})::DOUBLE"
        ms = msx = "CAST(NULL AS VARCHAR)"
        al = "CAST(NULL AS DOUBLE)"
    elif kind == "ts":
        mn, mx = f"epoch_us(min({c}))::DOUBLE", f"epoch_us(max({c}))::DOUBLE"
        ms = msx = "CAST(NULL AS VARCHAR)"
        al = "CAST(NULL AS DOUBLE)"
    else:
        mn = mx = "CAST(NULL AS DOUBLE)"
        ms, msx = f"min({c})", f"max({c})"
        al = f"sum(length({c}))::DOUBLE / count({c})"
    return f"""
  SELECT '{c}' AS column_name, count(*) AS n_rows,
         count(CASE WHEN {c} IS NULL THEN 1 END) AS n_nulls,
         count(DISTINCT {c}) AS n_distinct,
         {mn} AS min_num, {mx} AS max_num,
         {ms} AS min_str, {msx} AS max_str, {al} AS avg_len
  FROM orders"""


PROFILE_ORDERS_ORACLE = (
    "\nUNION ALL\n".join(
        _profile_col_sql(c, k)
        for c, k in [
            ("o_orderkey", "num"), ("o_custkey", "num"), ("o_orderstatus", "str"),
            ("o_totalprice", "num"), ("o_orderdate", "ts"), ("o_orderpriority", "str"),
        ]
    )
    + "\nORDER BY column_name"
)


@register("profile_orders", oracle=PROFILE_ORDERS_ORACLE,
          doc="ANALYZE-style column profile: nulls/distinct/min/max/avg_len for every orders column in ONE aggregation pass")
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/profiling.profile_table — the whole profile folds in one
    partial aggregate (single one-row shuffle) + a row-local unpivot; the
    oracle recomputes it column-by-column. Exact distincts here (oracle-
    checkable); exact_distinct=False switches to one-pass HLL at 100 TB."""
    from duckdb_routing_spark.operators.profiling import profile_table

    return profile_table(table(spark, sf_dir, "orders")).orderBy("column_name")


DQ_AUDIT_ORACLE = """
SELECT 'orderkey_unique' AS check_name, 'unique' AS kind,
       coalesce(sum(cnt - 1), 0)::BIGINT AS n_violations,
       coalesce(sum(cnt - 1), 0) = 0 AS passed
FROM (SELECT count(*) AS cnt FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
UNION ALL
SELECT 'custkey_not_null', 'not_null',
       count(CASE WHEN o_custkey IS NULL THEN 1 END)::BIGINT,
       count(CASE WHEN o_custkey IS NULL THEN 1 END) = 0
FROM orders
UNION ALL
SELECT 'custkey_resolves', 'reference', count(*)::BIGINT, count(*) = 0
FROM (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL) o
LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c ON o.o_custkey = c.c_custkey
WHERE c.c_custkey IS NULL
UNION ALL
SELECT 'status_enum', 'predicate',
       count(CASE WHEN NOT coalesce(o_orderstatus IN ('F','O','P'), false) THEN 1 END)::BIGINT,
       count(CASE WHEN NOT coalesce(o_orderstatus IN ('F','O','P'), false) THEN 1 END) = 0
FROM orders
UNION ALL
SELECT 'price_over_5000', 'predicate',
       count(CASE WHEN NOT coalesce(o_totalprice > 5000, false) THEN 1 END)::BIGINT,
       count(CASE WHEN NOT coalesce(o_totalprice > 5000, false) THEN 1 END) = 0
FROM orders
ORDER BY check_name
"""


@register("dq_audit_orders", oracle=DQ_AUDIT_ORACLE,
          doc="declarative data-quality audit: unique/not-null/reference/enum/range checks -> violation counts")
def dq_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/profiling.run_checks — the dbt-test/Deequ shape: each
    constraint compiles to its minimal plan (key groupBy, scan-pushed
    predicate count, broadcast anti join) and the report unions one-row
    aggregates. price_over_5000 is a deliberately failing range check so
    the violation path is exercised, not just zeros."""
    from duckdb_routing_spark.operators.profiling import Check, run_checks

    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    checks = [
        Check("orderkey_unique", "unique", key_cols=("o_orderkey",)),
        Check("custkey_not_null", "not_null", expr="o_custkey"),
        Check("custkey_resolves", "reference", expr="o_custkey", ref=customer, ref_col="c_custkey"),
        Check("status_enum", "predicate", expr="o_orderstatus IN ('F','O','P')"),
        Check("price_over_5000", "predicate", expr="o_totalprice > 5000"),
    ]
    return run_checks(orders, checks).orderBy("check_name")


@register("q20_excess_stock", oracle=Q20_ORACLE,
          doc="TPC-H Q20 shape: nested IN subqueries (parts by name -> HAVING per supplier-part -> suppliers)")
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The excess-stock shape: innermost name-LIKE part scan broadcasts into
    a semi join on the fact table, the grouped HAVING runs on the (suppkey,
    partkey) pair, and the outer IN is a second semi join against the tiny
    supplier dim. DECIMAL quantity sum keeps the HAVING threshold exact."""
    _views(spark, sf_dir, "supplier", "nation", "lineitem", "part")
    return spark.sql(Q20_ORACLE)


PAGERANK_EDGES_SQL = """
SELECT 'c' || o.o_custkey AS src, 's' || l.l_suppkey AS dst, count(*)::BIGINT AS w
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey GROUP BY 1, 2"""


@register("graph_pagerank", doc="exact-integer PageRank (5 damped iterations) over the "
                                "customer->supplier order graph")
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative graph analytics over relational edges: the bipartite
    customer->supplier graph (edge weight = co-ordered line count) walked
    for 5 damped PageRank rounds in BIGINT micro-units (operators/graph.py)
    — byte-deterministic under any partitioning, every iteration one
    src-keyed join + one dst-keyed partial agg, lineage truncated per
    round. Suppliers are all dangling (bipartite sinks): their mass
    redistributes through the dangling term each round."""
    from duckdb_routing_spark.operators import graph as _graph

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .count()
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
            F.col("count").alias("w"),
        )
    )
    return _graph.pagerank(edges, iterations=5).orderBy("node")


from duckdb_routing_spark.operators.graph import pagerank_oracle_sql as _pr_oracle  # noqa: E402
from duckdb_routing_spark.queries.registry import REGISTRY as _REGISTRY  # noqa: E402

_REGISTRY["graph_pagerank"].oracle = _pr_oracle(PAGERANK_EDGES_SQL, iterations=5)


EVENTS_GAPFILL_ORACLE = """
WITH e AS (SELECT event_type AS k,
                  make_timestamp(((epoch_us(cast(ts AS TIMESTAMP)) // 1000000) // 3600) * 3600000000) AS bucket,
                  cast(value AS DECIMAL(18,4)) AS dv
           FROM events),
agg AS (SELECT k, bucket, count(*) AS n_events, cast(sum(dv) AS DOUBLE) AS v_sum
        FROM e GROUP BY 1, 2),
span AS (SELECT k, min(bucket) AS lo, max(bucket) AS hi FROM agg GROUP BY 1),
spine AS (SELECT k, unnest(generate_series(lo, hi, INTERVAL 3600 SECOND)) AS bucket FROM span),
j AS (SELECT s.k, s.bucket, coalesce(a.n_events, 0) AS n_events, a.v_sum,
             epoch_us(s.bucket) // 1000000 AS t,
             CASE WHEN a.v_sum IS NOT NULL THEN epoch_us(s.bucket) // 1000000 END AS obs_t
      FROM spine s LEFT JOIN agg a ON s.k = a.k AND s.bucket = a.bucket),
w AS (SELECT k, bucket, n_events, v_sum, t,
             last_value(v_sum IGNORE NULLS) OVER (PARTITION BY k ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(obs_t IGNORE NULLS) OVER (PARTITION BY k ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
             first_value(v_sum IGNORE NULLS) OVER (PARTITION BY k ORDER BY bucket
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(obs_t IGNORE NULLS) OVER (PARTITION BY k ORDER BY bucket
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM j)
SELECT k AS event_type, bucket, n_events, v_sum,
       pv AS v_locf,
       CASE WHEN v_sum IS NOT NULL THEN v_sum
            WHEN pv IS NOT NULL AND nv IS NOT NULL
            THEN pv + (nv - pv) * (cast(t - pt AS DOUBLE) / cast(nt - pt AS DOUBLE))
       END AS v_interp
FROM w
ORDER BY event_type, bucket
"""


@register("events_gapfill", oracle=EVENTS_GAPFILL_ORACLE,
          doc="dense hourly spine per event_type with LOCF + linear interpolation over gap buckets")
def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series (operators/timeseries.py bucket_gapfill):
    missing hours materialize as rows (n_events=0), values carry forward
    (LOCF) and interpolate linearly between the neighbouring observations —
    the TimescaleDB time_bucket_gapfill/locf/interpolate surface. Spine
    generation is row-local sequence+explode off the per-key min/max
    aggregate; LOCF/interp are per-key ordered windows over the DENSE spine
    (partition size = span/step, independent of event volume)."""
    from duckdb_routing_spark.operators.timeseries import bucket_gapfill

    return bucket_gapfill(table(spark, sf_dir, "events")).orderBy("event_type", "bucket")


SCD2_CUSTOMER_STATUS_ORACLE = """
WITH c AS (SELECT o_custkey AS k, cast(o_orderdate AS TIMESTAMP) AS ts,
                  o_orderkey AS tb, o_orderstatus AS st FROM orders),
m AS (SELECT k, ts, tb, st,
             row_number() OVER w AS rn,
             CASE WHEN lag(st) OVER w IS DISTINCT FROM st THEN 1 ELSE 0 END AS chg
      FROM c WINDOW w AS (PARTITION BY k ORDER BY ts, tb)),
s AS (SELECT k, ts, tb, st FROM m WHERE rn = 1 OR chg = 1)
SELECT k AS o_custkey, st AS o_orderstatus, ts AS valid_from,
       lead(ts) OVER w2 AS valid_to,
       row_number() OVER w2 AS version,
       (lead(ts) OVER w2 IS NULL) AS is_current
FROM s WINDOW w2 AS (PARTITION BY k ORDER BY ts, tb)
ORDER BY o_custkey, version
"""


@register("scd2_customer_status", oracle=SCD2_CUSTOMER_STATUS_ORACLE,
          doc="SCD2 dimension build: order-status change runs per customer with [valid_from, valid_to) validity")
def scd2_customer_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension (operators/scd.py): the orders
    changelog collapsed to status-change points per customer, each run
    carrying [valid_from, valid_to) validity, a per-key version and an
    is_current flag — the queryable history a CDC pipeline maintains.
    Both windows key on the dimension key; partition size is one
    customer's history."""
    from duckdb_routing_spark.operators.scd import scd2_from_changelog

    o = table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").alias("ts"), "o_orderkey", "o_orderstatus"
    )
    return scd2_from_changelog(
        o, key_col="o_custkey", ts_col="ts", attr_cols=["o_orderstatus"],
        tiebreak_col="o_orderkey",
    ).select(
        "o_custkey", "o_orderstatus", "valid_from", "valid_to", "version", "is_current"
    ).orderBy("o_custkey", "version")


ORDERS_INCR_AGG_ORACLE = """
SELECT o_orderpriority,
       count(o_totalprice)::BIGINT AS n,
       cast(sum(cast(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total,
       cast(sum(cast(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) / count(o_totalprice) AS mean,
       min(o_totalprice) AS v_min,
       max(o_totalprice) AS v_max
FROM orders GROUP BY 1 ORDER BY 1
"""


@register("orders_incremental_agg", oracle=ORDERS_INCR_AGG_ORACLE,
          doc="incremental aggregate maintenance: base state + delta batch merged == full recompute (the oracle IS the recompute)")
def orders_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view delta pattern (operators/incremental.py): the
    orders table split into a 'history' state and a 'today' delta batch;
    the keyed states merge (counts/DECIMAL sums add, min/max fold) and the
    oracle recomputes over the FULL table — merge == recompute is the
    operator's contract, checked bit-for-bit. A daily update costs
    O(|delta| + |keys|) regardless of history size."""
    from duckdb_routing_spark.operators import incremental as _incr

    o = table(spark, sf_dir, "orders")
    base = o.where(F.col("o_orderkey") % 3 != 0)
    delta = o.where(F.col("o_orderkey") % 3 == 0)
    keys = ["o_orderpriority"]
    state = _incr.partial_agg_state(base, keys, "o_totalprice")
    merged = _incr.merge_agg_states(state, _incr.partial_agg_state(delta, keys, "o_totalprice"), keys)
    return _incr.finalize_agg_state(merged, keys).orderBy("o_orderpriority")


ER_CUSTOMER_PAIRS_ORACLE = """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       levenshtein(a.c_name, b.c_name)::BIGINT AS dist
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_mktsegment = b.c_mktsegment
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 2
ORDER BY id_a, id_b
"""


@register("er_customer_pairs", oracle=ER_CUSTOMER_PAIRS_ORACLE,
          doc="entity resolution: blocked Levenshtein candidate pairs over customer names (block = nation x segment)")
def er_customer_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage candidates (operators/er.py): the self-join keys on
    the blocking columns so the pair space is per-block, Levenshtein runs
    JVM-side, and unit-cost edit distance is the same integer in every
    engine — matched pairs feed the shared cluster/survivor machinery the
    way LSH candidates feed fuzzy dedup."""
    from duckdb_routing_spark.operators.er import blocked_levenshtein_pairs

    return blocked_levenshtein_pairs(
        table(spark, sf_dir, "customer"),
        id_col="c_custkey",
        name_col="c_name",
        block_cols=["c_nationkey", "c_mktsegment"],
        max_dist=2,
    ).orderBy("id_a", "id_b")


def _hll_daily_rollup_oracle(b: int = 12) -> str:
    """Direct per-day register table — the rollup's oracle computes each
    day's sketch straight from the events, so a MATCH proves the
    hourly->daily merge equals the sketch of the union."""
    from duckdb_routing_spark.operators.sketch import HASH_BITS

    w = HASH_BITS - b
    return f"""
WITH h AS (
  SELECT cast(ts AS TIMESTAMP)::DATE AS day,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM events WHERE user_id IS NOT NULL
),
rr AS (
  SELECT day, CAST(hv // {1 << w} AS INTEGER) AS register,
         CAST(CASE WHEN hv % {1 << w} = 0 THEN {w + 1}
              ELSE {w + 1} - length(bin(hv % {1 << w})) END AS INTEGER) AS rank
  FROM h
)
SELECT strftime(day, '%Y-%m-%d') AS day, register, max(rank) AS max_rank
FROM rr GROUP BY day, register ORDER BY day, register
"""


EVENTS_DAILY_HLL_ORACLE = _hll_daily_rollup_oracle()


@register("events_daily_hll_rollup", oracle=EVENTS_DAILY_HLL_ORACLE,
          doc="hourly HLL sketches merged to daily distinct-user registers — the fold never re-reads events")
def events_daily_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable-rollup contract, driver-visible: per-(day, hour)
    register tables (<= 2^b rows each) fold to per-day sketches via
    groupBy-MAX (operators/sketch.py hll_merge_grouped) — the daily pass
    touches register rows only. The oracle computes each day's registers
    DIRECTLY from the events, so the hash match proves merge == sketch of
    the union. In production the hourly tables persist and days/weeks fold
    incrementally without ever rescanning history."""
    from duckdb_routing_spark.operators import sketch as _sketch

    e = (
        table(spark, sf_dir, "events")
        .withColumn("day", F.date_format(F.to_date("ts"), "yyyy-MM-dd"))
        .withColumn("hr", F.hour("ts"))
    )
    hourly = _sketch.hll_registers_grouped(e, "user_id", ["day", "hr"], b=12)
    return _sketch.hll_merge_grouped(hourly, ["day"]).orderBy("day", "register")


GEO_PIP_ORACLE = """
WITH poly AS (
  SELECT n_nationkey AS poly_id,
         (('0x' || substr(md5('gx:' || n_nationkey), 1, 8))::BIGINT % 10000) / 100.0 AS cx,
         (('0x' || substr(md5('gy:' || n_nationkey), 1, 8))::BIGINT % 10000) / 100.0 AS cy,
         5 + (('0x' || substr(md5('gr:' || n_nationkey), 1, 8))::BIGINT % 1000) / 100.0 AS r
  FROM nation
),
pv AS (
  SELECT poly_id,
         [{'x': cx + r, 'y': cy}, {'x': cx, 'y': cy + r}, {'x': cx - r, 'y': cy},
          {'x': cx, 'y': cy - r}, {'x': cx + r, 'y': cy}] AS vs
  FROM poly
),
pts AS (
  SELECT c_custkey AS point_id,
         (('0x' || substr(md5('px:' || c_custkey), 1, 8))::BIGINT % 10000) / 100.0 AS px,
         (('0x' || substr(md5('py:' || c_custkey), 1, 8))::BIGINT % 10000) / 100.0 AS py
  FROM customer
)
SELECT point_id, poly_id
FROM pts, pv
WHERE (list_sum(list_transform(range(1, len(vs)), i ->
        CASE WHEN ((vs[i].y > py) != (vs[i + 1].y > py))
              AND (px < (vs[i + 1].x - vs[i].x) * (py - vs[i].y) / (vs[i + 1].y - vs[i].y) + vs[i].x)
        THEN 1 ELSE 0 END))) % 2 = 1
ORDER BY point_id, poly_id
"""


@register("geo_points_in_polygons", oracle=GEO_PIP_ORACLE,
          doc="spatial join: hashed customer points inside hashed nation diamonds via grid-cell blocking + HOF ray cast")
def geo_points_in_polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked point-in-polygon join (operators/geo_join.py): polygons
    explode onto their bbox grid cells, points hash to one cell, the
    even-odd ray cast runs as a row-local HOF expression — candidate space
    = cell occupancy, never |points| x |polygons|. The DuckDB oracle
    cross-joins the same exact-arithmetic fixtures with the identical
    crossing expression, so a MATCH also proves the blocking loses no
    pair. (Deterministic diamond rings keep every coordinate md5-derived
    integer math — no transcendental vertex placement to diverge.)"""
    from duckdb_routing_spark.operators.geo_join import points_in_polygons

    def h8(tag: str, key: str, mod: int) -> str:
        return (
            f"cast(conv(substring(md5(concat('{tag}:', {key})), 1, 8), 16, 10) as bigint)"
            f" % {mod}"
        )

    polys = table(spark, sf_dir, "nation").selectExpr(
        "n_nationkey AS poly_id",
        f"({h8('gx', 'n_nationkey', 10000)}) / 100.0 AS cx",
        f"({h8('gy', 'n_nationkey', 10000)}) / 100.0 AS cy",
        f"5 + ({h8('gr', 'n_nationkey', 1000)}) / 100.0 AS r",
    ).selectExpr(
        "poly_id",
        "array(struct(cx + r AS x, cy AS y), struct(cx AS x, cy + r AS y),"
        " struct(cx - r AS x, cy AS y), struct(cx AS x, cy - r AS y),"
        " struct(cx + r AS x, cy AS y)) AS vertices",
    )
    pts = table(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS point_id",
        f"({h8('px', 'c_custkey', 10000)}) / 100.0 AS x",
        f"({h8('py', 'c_custkey', 10000)}) / 100.0 AS y",
    )
    return points_in_polygons(pts, polys, cell_size=10.0).orderBy("point_id", "poly_id")


ER_GOLDEN_ORACLE = """
WITH RECURSIVE p AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_mktsegment = b.c_mktsegment
   AND a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= 2
),
edges AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
reach(n, lab) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.n
),
comp AS (SELECT n AS c_custkey, min(lab) AS cid FROM reach GROUP BY n),
ranked AS (
  SELECT c.c_custkey, c.cid,
         row_number() OVER (PARTITION BY c.cid ORDER BY cu.c_acctbal DESC, c.c_custkey) AS rk
  FROM comp c JOIN customer cu USING (c_custkey)
)
SELECT cu.c_custkey,
       coalesce(r.cid, cu.c_custkey) AS cluster_id,
       coalesce(r.rk = 1, TRUE) AS is_golden
FROM customer cu LEFT JOIN ranked r USING (c_custkey)
ORDER BY cu.c_custkey
"""


@register("er_customer_golden", oracle=ER_GOLDEN_ORACLE,
          doc="entity resolution end to end: blocked pairs -> star-contraction components -> golden record per cluster (argmax acctbal)")
def er_customer_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full record-linkage pipeline in one plan: Levenshtein candidate
    pairs (operators/er.py) feed the O(log n) star-contraction components
    (operators/dedup.py — the same machinery fuzzy dedup uses), and each
    cluster elects its golden record by highest account balance with id
    tiebreak. The oracle replays the closure as a recursive CTE + ranked
    window, so the hash match pins pairs, components AND the survivor
    policy cross-engine."""
    from duckdb_routing_spark.operators import dedup as _dedup
    from duckdb_routing_spark.operators.er import blocked_levenshtein_pairs
    from pyspark.sql import Window

    cust = table(spark, sf_dir, "customer")
    pairs = blocked_levenshtein_pairs(
        cust, id_col="c_custkey", name_col="c_name",
        block_cols=["c_nationkey", "c_mktsegment"], max_dist=2,
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    comp = _dedup.dedup_clusters_star(pairs).select(
        F.col("doc_id").alias("c_custkey"), F.col("cluster_id").alias("cid")
    )
    ranked = comp.join(cust.select("c_custkey", "c_acctbal"), "c_custkey").withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("cid").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        ),
    )
    return (
        cust.select("c_custkey")
        .join(ranked.select("c_custkey", "cid", "rk"), "c_custkey", "left")
        .select(
            "c_custkey",
            F.coalesce("cid", "c_custkey").alias("cluster_id"),
            F.coalesce(F.col("rk") == 1, F.lit(True)).alias("is_golden"),
        )
        .orderBy("c_custkey")
    )


_ER_EDGES_SQL = """
  SELECT a.c_custkey AS a, b.c_custkey AS b
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_mktsegment = b.c_mktsegment
   AND a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= 2
"""


def _triangles_oracle() -> str:
    from duckdb_routing_spark.operators.graph import triangle_oracle_sql

    return triangle_oracle_sql(_ER_EDGES_SQL) + "ORDER BY node"


@register("graph_triangles", oracle=_triangles_oracle(),
          doc="exact per-node triangle counts over the ER linkage graph (sorted-orientation wedge closure)")
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting (Suri & Vassilvitskii 2011 NodeIterator++ shape)
    over the entity-resolution candidate graph — the local-clustering
    signal that separates dense duplicate cliques from chance pair hits.
    Two vertex-keyed equi-joins, wedges routed through their middle vertex;
    exact integers end to end."""
    from duckdb_routing_spark.operators.er import blocked_levenshtein_pairs
    from duckdb_routing_spark.operators.graph import triangle_counts

    pairs = blocked_levenshtein_pairs(
        table(spark, sf_dir, "customer"), id_col="c_custkey", name_col="c_name",
        block_cols=["c_nationkey", "c_mktsegment"], max_dist=2,
    ).select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    return triangle_counts(pairs).orderBy("node")


UNPIVOT_ORACLE = """
WITH piv AS (
  SELECT o_orderpriority,
         count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS status_O,
         count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS status_F,
         count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS status_P
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, status, n::BIGINT AS n
FROM piv UNPIVOT (n FOR status IN (status_O, status_F, status_P))
ORDER BY o_orderpriority, status
"""


@register("unpivot_order_status", oracle=UNPIVOT_ORACLE,
          doc="UNPIVOT (melt): the wide status columns back to long form — the reshaping inverse of pivot_order_status")
def unpivot_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide -> long via Spark's native unpivot (DataFrame.unpivot / SQL
    UNPIVOT, Spark 3.4+), completing the reshaping pair: building the wide
    table is the exposed pivot query, melting it back is row-local
    (Expand, zero shuffle past the pivot's own aggregation)."""
    wide = pivot_status(spark, sf_dir)
    return (
        wide.unpivot(
            ["o_orderpriority"],
            ["status_O", "status_F", "status_P"],
            "status",
            "n",
        )
        .select("o_orderpriority", "status", F.col("n").cast("long").alias("n"))
        .orderBy("o_orderpriority", "status")
    )


EVENTS_VARIANT_ORACLE = """
SELECT event_type,
       count(*) AS n,
       sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS k_total,
       max(json_extract(props, '$.k')::BIGINT)::BIGINT AS k_max
FROM events
GROUP BY event_type ORDER BY event_type
"""


@register("events_variant_extract", oracle=EVENTS_VARIANT_ORACLE,
          doc="Spark 4 VARIANT path: parse_json + typed variant_get aggregation over semi-structured props")
def events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The open-format semi-structured tier (Spark 4 VariantType): props
    parse ONCE into the binary variant encoding, then typed variant_get
    extraction feeds a plain keyed aggregate — the engine-native analog of
    shredding JSON at the scan instead of re-parsing strings per access
    (events_json_extract keeps the string-path form for comparison). All
    integer outputs; the oracle extracts through DuckDB's JSON type."""
    e = table(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("k_total"),
            F.max("k").cast("long").alias("k_max"),
        )
        .orderBy("event_type")
    )
