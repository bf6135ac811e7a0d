"""Canonical TPC-H anchor queries (Q1 pricing summary, Q3 shipping
priority, Q5 local-supplier volume) adapted to the test tables' column
subset and 1995–2001 date range — the industry-standard relational
yardstick, registered so the engine's analytics core is measured on
queries every reviewer already knows. The reference has no equivalent
surface (its relational reads are point/ilike lookups — tools.py:31-91);
these anchor the "full analytics engine" claim the rest of the registry
makes piecewise.

Exactness rules (the flagship_revenue_by_brand conventions): money
doubles cast to DECIMAL(18,2) and rate doubles to DECIMAL(4,2) BEFORE
arithmetic (both grids are exact 2-dp values — verified, no rounding
boundary), products/sums stay in exact DECIMAL and cast to double only
at the end; averages are one double division of exact aggregates, the
same operation order on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_agent_graphdb_spark import catalog
from sales_agent_graphdb_spark.registry import register

_MONEY = "decimal(18,2)"
_RATE = "decimal(4,2)"


@register(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))
                    * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 — the pricing summary report: one full lineitem scan,
    a 4-ish-group aggregate of eight measures. The canonical
    scan-dominated query: the shuffle carries ONLY per-group partials
    (map-side combine), so at 100 TB the cost is the columnar scan of
    6 columns, which parquet column pruning and the shipdate min/max
    row-group filter both cut. Averages are derived from the exact
    DECIMAL sums by one double division (identical operand order on
    both engines), never a separate AVG aggregate with its own
    summation order."""
    li = catalog.load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    price = F.col("l_extendedprice").cast(_MONEY)
    disc = F.col("l_discount").cast(_RATE)
    tax = F.col("l_tax").cast(_RATE)
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(_MONEY)).alias("_sq"),
        F.sum(price).alias("_sp"),
        F.sum(price * (1 - disc)).alias("_sd"),
        F.sum(price * (1 - disc) * (1 + tax)).alias("_sc"),
        F.sum(disc).alias("_sdisc"),
        F.count(F.lit(1)).alias("_n"),
    )
    n_d = F.col("_n").cast("double")
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.col("_sq").cast("double").alias("sum_qty"),
        F.col("_sp").cast("double").alias("sum_base_price"),
        F.col("_sd").cast("double").alias("sum_disc_price"),
        F.col("_sc").cast("double").alias("sum_charge"),
        (F.col("_sq").cast("double") / n_d).alias("avg_qty"),
        (F.col("_sp").cast("double") / n_d).alias("avg_price"),
        (F.col("_sdisc").cast("double") / n_d).alias("avg_disc"),
        F.col("_n").alias("count_order"),
    ).orderBy("l_returnflag", "l_linestatus")


@register(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           o.o_orderdate AS orderdate,
           o.o_orderpriority AS priority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, orderdate, orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 — shipping priority: the selective 3-way star join
    (segment-filtered customers -> date-filtered orders -> lineitems
    shipped after the cutoff) + revenue top-10. The test schema has no
    o_shippriority column; o_orderpriority stands in (same role in
    the output, different domain). Scale shape: both filters reach
    the scans (PushedFilters), the customer side collapses to a
    broadcast after its segment filter at driver SFs (AQE decides by
    size at 100 TB), and the top-10 plans as TakeOrderedAndProject —
    no global sort materializes. Deterministic tie-break on
    (orderdate, orderkey) added to the classic ORDER BY so the LIMIT
    edge is stable across engines."""
    c = catalog.load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = catalog.load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = catalog.load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    rev = (
        F.col("l_extendedprice").cast(_MONEY)
        * (1 - F.col("l_discount").cast(_RATE))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("orderkey", "revenue", "orderdate", "priority")
        .orderBy(F.col("revenue").desc(), "orderdate", "orderkey")
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 — local supplier volume: the 6-way join (customer,
    orders, lineitem, supplier, nation, region) with the
    customer-nation == supplier-nation locality constraint, revenue
    per ASIA nation over one order year. Scale shape: region/nation
    prune to a handful of rows and broadcast; the locality equality
    rides the supplier join as a second equi-key (never a post-join
    filter over the full cross-nation volume); the orderdate year
    filter reaches the orders scan. The only big exchanges are the
    fact tables keyed once each. Deterministic secondary sort on
    nation under equal revenue."""
    c = catalog.load_table(spark, sf_dir, "customer")
    o = catalog.load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = catalog.load_table(spark, sf_dir, "lineitem")
    s = catalog.load_table(spark, sf_dir, "supplier")
    n = catalog.load_table(spark, sf_dir, "nation")
    r = catalog.load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    rev = (
        F.col("l_extendedprice").cast(_MONEY)
        * (1 - F.col("l_discount").cast(_RATE))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "nation")
    )
