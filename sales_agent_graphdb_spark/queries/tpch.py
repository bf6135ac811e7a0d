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


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_candidates
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 — forecasting revenue change: the pure
    filter-and-aggregate probe (no join, no group): one year of
    shipments, discount band, small quantities. The canonical test
    that EVERY predicate reaches the scan — date range prunes row
    groups via parquet min/max, the discount/quantity conjuncts ride
    PushedFilters — and the aggregate is a single map-side partial per
    task. The discount band compares doubles against the exact grid
    values (0.05/0.07 are members of the 2-dp domain, and both engines
    compare the same stored doubles), while the SUM runs in exact
    DECIMAL."""
    li = catalog.load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(
            F.col("l_extendedprice").cast(_MONEY)
            * F.col("l_discount").cast(_RATE)
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_candidates"),
    )


@register(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_name AS name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           n.n_name AS nation,
           CAST(c.c_acctbal AS DOUBLE) AS acctbal
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 — returned-item reporting: which customers returned
    the most revenue in a quarter. 4-way join (returnflag-filtered
    lineitems -> quarter orders -> customers -> broadcast nation) +
    revenue top-20 as TakeOrderedAndProject. The classic customer-
    attribution shape: the fact side shrinks at the scan (returnflag +
    date pushed), the group key is the customer, and the limit never
    materializes a global sort. Deterministic tie-break on custkey."""
    c = catalog.load_table(spark, sf_dir, "customer")
    o = catalog.load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = catalog.load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = catalog.load_table(spark, sf_dir, "nation")
    rev = (
        F.col("l_extendedprice").cast(_MONEY)
        * (1 - F.col("l_discount").cast(_RATE))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
            F.col("c_acctbal").cast("double").alias("acctbal"),
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("custkey", "name", "revenue", "nation", "acctbal")
        .orderBy(F.col("revenue").desc(), "custkey")
        .limit(20)
    )


_Q18_QTY = 150


@register(
    "tpch_q18_large_volume_customer",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > {_Q18_QTY})
    SELECT c.c_name AS name, c.c_custkey AS custkey,
           o.o_orderkey AS orderkey, o.o_orderdate AS orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN big b ON o.o_orderkey = b.l_orderkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY totalprice DESC, orderdate, orderkey
    LIMIT 20
    """,
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 — large-volume customers: orders whose TOTAL line
    quantity exceeds {qty}, with their customers, top-20 by order
    value. The canonical aggregate-subquery shape: the qualifying
    order keys come from a standalone groupBy-HAVING over lineitem
    and re-enter the main join as a key list — at 100 TB that
    qualifier frame is tiny (highly selective HAVING) and AQE
    broadcasts it, turning the subquery into a semi-join-shaped
    prefilter on orders rather than a second full aggregate inside
    the join. Quantity sums run in exact DECIMAL; top-20 plans as
    TakeOrderedAndProject with a deterministic (orderdate, orderkey)
    tie-break."""
    li = catalog.load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast(_MONEY)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("_tq"))
        .filter(F.col("_tq") > _Q18_QTY)
        .select("l_orderkey")
    )
    c = catalog.load_table(spark, sf_dir, "customer")
    o = catalog.load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li.select("l_orderkey", "l_quantity"), o.o_orderkey == li.l_orderkey)
        .join(big.withColumnRenamed("l_orderkey", "_bk"), F.col("o_orderkey") == F.col("_bk"))
        .groupBy(
            F.col("c_name").alias("name"),
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
        )
        .agg(F.sum(F.col("l_quantity").cast(_MONEY)).cast("double").alias("sum_qty"))
        .orderBy(F.col("totalprice").desc(), "orderdate", "orderkey")
        .limit(20)
    )


tpch_q18_large_volume_customer.__doc__ = (
    tpch_q18_large_volume_customer.__doc__.format(qty=_Q18_QTY)
)


@register(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority ORDER BY priority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 — order priority checking: orders in one quarter with
    at least one line item shipped after the order date, counted per
    priority. The canonical EXISTS decorrelation anchor: expressed as
    a LEFT SEMI join on the order key with the ship-after-order
    condition as a join predicate — Catalyst plans the same shape from
    the SQL text (sql_api_exists_in probes LeftSemi), and the semi
    join short-circuits on first match instead of materializing the
    one-to-many fanout. The date filter prunes the orders scan before
    the join."""
    o = catalog.load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = catalog.load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    qualified = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return (
        qualified.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# Round 7 (VERDICT r06 #1): the optimizer classes the first seven
# anchors don't reach — correlated SCALAR subqueries (Q17's per-part
# AVG, Q2's per-group extremum), disjunctive OR-of-conjuncts pushdown
# (Q19), the double-correlated EXISTS / NOT-EXISTS stack (Q21), and
# the conditional-aggregate pair (Q12/Q14). Each statement is
# submitted to spark.sql() VERBATIM and to DuckDB as its own oracle
# (the sql_api convention, relational.py:561) — so what is certified
# is Catalyst's own rewrite of hand-written SQL text, not a DataFrame
# translation. Plan shapes pinned in tests/test_plans.py.
#
# Schema adaptations (testdata has no partsupp, l_commitdate,
# l_receiptdate, l_shipmode, p_container): Q2's min-supplycost becomes
# max-acctbal per nation (same correlated-extremum class), Q17/Q19
# substitute p_type/p_size for p_container, Q21/Q12's late-shipment
# predicate becomes l_shipdate > o_orderdate + INTERVAL, which keeps
# the correlation shape while using the columns that exist.
# ---------------------------------------------------------------------------

_TPCH_TABLES = ("customer", "nation", "region", "supplier", "orders", "lineitem", "part")


def _tpch_views(spark: SparkSession, sf_dir: str) -> None:
    for t in _TPCH_TABLES:
        catalog.load_table(spark, sf_dir, t).createOrReplaceTempView(f"tpch_{t}")


_Q17 = """
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM {li} l JOIN {part} p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND p.p_type = 'PROMO'
      AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                          FROM {li} l2 WHERE l2.l_partkey = l.l_partkey)
"""


@register(
    "tpch_q17_small_quantity_revenue",
    oracle=_Q17.format(li="lineitem", part="part"),
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 — small-quantity-order revenue: lineitems of one
    brand/type whose quantity is below half the PER-PART average. The
    canonical correlated SCALAR subquery: a naive engine re-executes
    the AVG per outer row (O(|lineitem|) scans); Catalyst decorrelates
    to ONE per-partkey aggregate joined back as an equi-join with the
    quantity comparison as the join residual — tests/test_plans.py pins
    exactly that shape (HashAggregate[avg] keyed on l_partkey feeding a
    join, zero nested loops). At 100 TB the rewrite is the difference
    between two lineitem scans and a quadratic blowup. AVG over the
    integer-valued quantity doubles is exact (sums of small ints are
    exact in double, one division, same operand order both engines);
    revenue sums through exact DECIMAL. The /7.0 scaling is Q17's
    avg_yearly convention."""
    _tpch_views(spark, sf_dir)
    return spark.sql(_Q17.format(li="tpch_lineitem", part="tpch_part"))


_Q2 = """
    SELECT n.n_name AS nation, s.s_name AS supplier,
           CAST(s.s_acctbal AS DOUBLE) AS acctbal
    FROM {sup} s JOIN {nat} n ON s.s_nationkey = n.n_nationkey
    JOIN {reg} r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
      AND s.s_acctbal = (SELECT MAX(s2.s_acctbal) FROM {sup} s2
                         WHERE s2.s_nationkey = s.s_nationkey)
    ORDER BY acctbal DESC, nation, supplier
"""


@register(
    "tpch_q2_top_supplier_per_nation",
    oracle=_Q2.format(sup="supplier", nat="nation", reg="region"),
)
def tpch_q2_top_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (adapted: no partsupp table, so min-supplycost-per-
    region becomes max-acctbal-per-nation — the same correlated-
    extremum class): the supplier(s) holding each EUROPE nation's
    maximum account balance, selected by equality against a correlated
    scalar MAX. Catalyst decorrelates to one per-nationkey MAX
    aggregate equi-joined back (float-safe: the equality runs through
    knownfloatingpointnormalized on both sides); region/nation prune
    and broadcast. The equality compares a stored double against the
    MAX of stored doubles — no arithmetic, so cross-engine exactness is
    structural. Ties (two suppliers sharing the max) would both
    survive, exactly as in real Q2."""
    _tpch_views(spark, sf_dir)
    return spark.sql(_Q2.format(sup="tpch_supplier", nat="tpch_nation", reg="tpch_region"))


_Q19 = """
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM {li} l JOIN {part} p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
"""


@register(
    "tpch_q19_disjunctive_or",
    oracle=_Q19.format(li="lineitem", part="part"),
)
def tpch_q19_disjunctive_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 — discounted revenue under an OR of three brand/size/
    quantity conjunct groups (p_container→p_size adaptation). The
    disjunctive-pushdown anchor: the WHERE references BOTH join sides
    inside each OR branch, so a naive plan joins first and filters the
    full join output. Catalyst's CNF conversion derives the
    table-local residues — the OR of quantity bands reaches the
    lineitem SCAN and the OR of brand/size conjuncts reaches the part
    scan as PushedFilters (pinned in tests/test_plans.py), so at 100 TB
    the join input is pre-shrunk by both disjunctions instead of
    carrying every row to the join. Revenue through exact DECIMAL;
    quantity bands compare the integer-valued stored doubles."""
    _tpch_views(spark, sf_dir)
    return spark.sql(_Q19.format(li="tpch_lineitem", part="tpch_part"))


_Q21 = """
    WITH lo AS (
      SELECT l.l_orderkey AS okey, l.l_suppkey AS skey,
             (l.l_shipdate > o.o_orderdate + INTERVAL 75 DAY) AS is_late
      FROM {li} l JOIN {ord} o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F')
    SELECT s.s_name AS supplier, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lo l1 JOIN {sup} s ON s.s_suppkey = l1.skey
    WHERE l1.is_late
      AND EXISTS (SELECT 1 FROM lo l2
                  WHERE l2.okey = l1.okey AND l2.skey <> l1.skey)
      AND NOT EXISTS (SELECT 1 FROM lo l3
                      WHERE l3.okey = l1.okey AND l3.skey <> l1.skey
                        AND l3.is_late)
    GROUP BY s.s_name
    ORDER BY numwait DESC, supplier
    LIMIT 20
"""


@register(
    "tpch_q21_waiting_supplier",
    oracle=_Q21.format(li="lineitem", ord="orders", sup="supplier"),
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 — suppliers who kept orders waiting: for finished
    orders, the supplier whose lineitem shipped late (>75 days after
    the order date — the l_receiptdate>l_commitdate adaptation) while
    being the ONLY late supplier in a multi-supplier order. The
    double-correlated EXISTS + NOT-EXISTS stack on the same fact: both
    subqueries correlate on l1's order key with a supplier-inequality
    residual, and Catalyst plans them as a LeftSemi and a LeftAnti
    join STACKED on one fact flow (pinned in tests/test_plans.py) —
    never a per-row re-scan. The shared `lo` CTE keeps the late flag
    computed once; at 100 TB all three consumers key on okey, so the
    semi/anti joins co-partition with the fact. Counts exact; the
    top-20 is TakeOrderedAndProject."""
    _tpch_views(spark, sf_dir)
    return spark.sql(_Q21.format(li="tpch_lineitem", ord="tpch_orders", sup="tpch_supplier"))


_Q12 = """
    SELECT l.l_returnflag AS returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM {ord} o JOIN {li} l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_returnflag ORDER BY returnflag
"""


@register(
    "tpch_q12_priority_classes",
    oracle=_Q12.format(ord="orders", li="lineitem"),
)
def tpch_q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 — shipping modes and order priority (adapted:
    l_returnflag stands in for the missing l_shipmode; late shipment =
    shipped >30 days after order date instead of the missing
    commit/receipt pair): one year of late-shipped lines, counted into
    high/low priority classes per flag. The conditional-aggregate
    anchor — both counts come from ONE pass as SUM(CASE...) partials
    (no self-join, no second scan), the pivoted-metrics shape every
    reporting workload uses. The cross-table inequality
    (l_shipdate vs o_orderdate) rides the join as a residual; the
    shipdate year bounds push to the lineitem scan."""
    _tpch_views(spark, sf_dir)
    return spark.sql(_Q12.format(ord="tpch_orders", li="tpch_lineitem"))


_Q14 = """
    SELECT CAST(100.00 * CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                                  * (1 - CAST(l.l_discount AS DECIMAL(4,2))))
                              FILTER (WHERE p.p_type = 'PROMO') AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           AS DOUBLE) AS promo_revenue_pct,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM {li} l JOIN {part} p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
"""


@register(
    "tpch_q14_promo_revenue",
    oracle=_Q14.format(li="lineitem", part="part"),
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 — promotion effect: PROMO-type revenue share of one
    ship month, as a single conditional-aggregate ratio. Uses the
    standard FILTER (WHERE ...) aggregate modifier — certified
    portable across both engines by this statement — so the promo
    numerator and the total denominator come from the SAME single
    pass over the month's join output. Both sums run in exact
    DECIMAL and convert to double only for the final ratio (one
    division, same operand order both engines). The month bounds push
    to the lineitem scan; part joins broadcast at driver SFs."""
    _tpch_views(spark, sf_dir)
    return spark.sql(_Q14.format(li="tpch_lineitem", part="tpch_part"))


# ---------------------------------------------------------------------------
# Round 7, second wave: the remaining schema-feasible anchors, each a
# class the registry hadn't certified from SQL text — Q7 (disjunctive
# nation-pairing across two dim roles), Q8 (role-playing dimension:
# nation joined twice under different roles + FILTER ratio), Q13
# (LEFT-OUTER aggregate with a join-condition filter and zero-count
# groups — the classic "customers with no orders still count" nuance),
# Q15 (an aggregate CTE consumed twice: as join input and by its own
# MAX subquery), Q22 (global scalar subquery + anti join + substring
# classification). Same statement-is-oracle convention.
# ---------------------------------------------------------------------------

_Q7 = """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM {sup} s
    JOIN {li} l ON s.s_suppkey = l.l_suppkey
    JOIN {ord} o ON o.o_orderkey = l.l_orderkey
    JOIN {cust} c ON c.c_custkey = o.o_custkey
    JOIN {nat} n1 ON s.s_nationkey = n1.n_nationkey
    JOIN {nat} n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
"""


@register(
    "tpch_q7_volume_shipping",
    oracle=_Q7.format(sup="supplier", li="lineitem", ord="orders", cust="customer", nat="nation"),
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 — volume shipping between two trading nations, per
    direction per ship year. The nation dim joins TWICE under
    different roles (supplier's vs customer's), and the nation-pair
    constraint is a DISJUNCTION over attributes of both roles — it
    can only evaluate after both dim joins, so the optimizer's job is
    keeping the two 25-row dims broadcast and the OR as a cheap
    post-broadcast filter rather than materializing a cross-nation
    fact blowup. Revenue exact-DECIMAL; year extraction is the only
    non-key expression in the group key."""
    _tpch_views(spark, sf_dir)
    return spark.sql(_Q7.format(
        sup="tpch_supplier", li="tpch_lineitem", ord="tpch_orders",
        cust="tpch_customer", nat="tpch_nation"))


_Q8 = """
    SELECT o_year,
           CAST(CAST(SUM(volume) FILTER (WHERE supp_nation = 'NATION_3') AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l.l_discount AS DECIMAL(4,2))) AS volume,
             n2.n_name AS supp_nation
      FROM {part} p
      JOIN {li} l ON p.p_partkey = l.l_partkey
      JOIN {sup} s ON s.s_suppkey = l.l_suppkey
      JOIN {ord} o ON o.o_orderkey = l.l_orderkey
      JOIN {cust} c ON c.c_custkey = o.o_custkey
      JOIN {nat} n1 ON c.c_nationkey = n1.n_nationkey
      JOIN {reg} r ON n1.n_regionkey = r.r_regionkey
      JOIN {nat} n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00') t
    GROUP BY o_year ORDER BY o_year
"""


@register(
    "tpch_q8_market_share",
    oracle=_Q8.format(part="part", li="lineitem", sup="supplier", ord="orders",
                      cust="customer", nat="nation", reg="region"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 — national market share: one nation's slice of EUROPE
    PROMO revenue per order year, from the 8-way star (nation joined
    twice: the customer's nation routes through region for the market
    filter, the supplier's nation is the share dimension). The
    share is a FILTER-aggregate ratio over the SAME single pass —
    note the volume stays at the product's NATURAL decimal precision
    (no re-cast: a rescale to (18,2) would ROUND, and Spark's HALF_UP
    vs DuckDB's banker's rounding diverge — the bug this query's
    first draft actually caught). Dims broadcast; the only big
    exchanges key the fact tables once each."""
    _tpch_views(spark, sf_dir)
    return spark.sql(_Q8.format(
        part="tpch_part", li="tpch_lineitem", sup="tpch_supplier",
        ord="tpch_orders", cust="tpch_customer", nat="tpch_nation",
        reg="tpch_region"))


_Q13 = """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
          FROM {cust} c LEFT JOIN {ord} o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderstatus = 'P' AND o.o_orderpriority = '1-URGENT'
          GROUP BY c.c_custkey) t
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""


@register(
    "tpch_q13_customer_distribution",
    oracle=_Q13.format(cust="customer", ord="orders"),
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 — customer order-count distribution: how many
    customers placed N qualifying orders, INCLUDING N=0. The
    outer-join-aggregate class: the status/priority filter must live
    in the JOIN CONDITION (in WHERE it would turn the left join inner and
    silently drop the zero-order customers), and COUNT(o_orderkey)
    counts non-null matches so unmatched customers land in the c_count
    = 0 bucket. The double aggregate re-shuffles |customers| rows then
    |distinct counts| rows — both bounded well below the fact. The
    per-customer count is itself cast to BIGINT so both engines feed
    identical group keys into the second aggregate."""
    _tpch_views(spark, sf_dir)
    return spark.sql(_Q13.format(cust="tpch_customer", ord="tpch_orders"))


_Q15 = """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_rev
      FROM {li}
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey AS suppkey, s.s_name AS name,
           CAST(r.total_rev AS DOUBLE) AS total_revenue
    FROM {sup} s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
    ORDER BY suppkey
"""


@register(
    "tpch_q15_top_supplier",
    oracle=_Q15.format(li="lineitem", sup="supplier"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 — top supplier: the quarter's revenue-per-supplier
    aggregate (the view in the official form, a CTE here) consumed
    TWICE — once as the join input and once by its own global MAX
    scalar subquery — with the top row selected by exact-DECIMAL
    equality, so ties would all surface (the official semantics; a
    LIMIT 1 would hide them). The aggregate is map-side combinable on
    l_suppkey; the MAX side reduces the same |suppliers|-row frame to
    one value broadcast back as a scalar. Equality compares exact
    decimals — no float boundary exists."""
    _tpch_views(spark, sf_dir)
    return spark.sql(_Q15.format(li="tpch_lineitem", sup="tpch_supplier"))


_Q22 = """
    SELECT SUBSTRING(c.c_name, 17, 1) AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM {cust} c
    WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM {cust} c2
                         WHERE c2.c_acctbal > 0.0)
      AND SUBSTRING(c.c_name, 17, 1) IN ('0','1','2','3','4','5','6')
      AND NOT EXISTS (SELECT 1 FROM {ord} o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderstatus = 'P')
    GROUP BY cntrycode ORDER BY cntrycode
"""


@register(
    "tpch_q22_global_sales_opportunity",
    oracle=_Q22.format(cust="customer", ord="orders"),
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 — global sales opportunity: above-average-balance
    customers with no PROCESSING order, bucketed by a name-substring
    code (position 17 varies in this testdata's name format; the
    official c_phone country code doesn't exist). Three classes in one
    statement: a GLOBAL (uncorrelated) scalar subquery — the AVG
    computes once and broadcasts as a literal into the filter, never
    per-row; a substring IN-list; and a correlated NOT EXISTS
    decorrelating to a left-anti join on the customer key. The output
    SUM goes through exact DECIMAL as always; the scalar AVG threshold
    itself is a double whose low bits could in principle differ across
    engines' summation orders, but the 2-dp acctbal grid sits far
    (>=1e-6 relative) from the average on this fixed testdata, so the
    comparison has no boundary row — verified at both driver SFs."""
    _tpch_views(spark, sf_dir)
    return spark.sql(_Q22.format(cust="tpch_customer", ord="tpch_orders"))


# ---------------------------------------------------------------------------
# Optimized DataFrame twins (round 7): the two statements above whose
# Catalyst plans are correct but leave 100 TB money on the table get a
# hand-optimized twin registered against the SAME oracle — the engine
# proves the rewrite is answer-preserving, the bench shows the win,
# and the SQL originals stay as the pure statement==oracle anchors.
# ---------------------------------------------------------------------------


@register(
    "tpch_q17_prefiltered_twin",
    oracle=_Q17.format(li="lineitem", part="part"),
)
def tpch_q17_prefiltered_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17, the plan Catalyst does NOT derive from the SQL text: the
    correlated-AVG side of the statement aggregates EVERY part's
    lineitems (the brand/type filter sits on the other join input, and
    no rule pushes a sibling filter through the decorrelated
    aggregate), so at 100 TB the whole fact is aggregated to serve
    ~0.4% of parts. This twin applies the semi-join prefilter by hand:
    broadcast the filtered part keys, LEFT SEMI both lineitem
    consumers down to qualifying parts FIRST, then aggregate and join.
    Answer-identical (the per-part AVG only ever feeds rows of
    qualifying parts — the oracle is literally Q17's), and the
    aggregate's input drops from |lineitem| to |qualifying lineitems|.
    Measured at sf0.1: 1.5-1.6x wall over the statement form and a
    shuffle of ~125 records vs its full per-part aggregate."""
    part_keys = (
        catalog.load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#3") & (F.col("p_type") == "PROMO"))
        .select("p_partkey")
    )
    li = catalog.load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(part_keys),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    thr = li.groupBy("l_partkey").agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("_thr")
    )
    qualified = li.join(thr, "l_partkey").filter(F.col("l_quantity") < F.col("_thr"))
    return qualified.agg(
        (
            F.sum(F.col("l_extendedprice").cast(_MONEY)).cast("double") / 7.0
        ).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "tpch_q21_one_pass_twin",
    oracle=_Q21.format(li="lineitem", ord="orders", sup="supplier"),
)
def tpch_q21_one_pass_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21, collapsed from three correlated passes to ONE per-order
    aggregate: the statement's `lo` CTE feeds the fact, the EXISTS and
    the NOT-EXISTS — Spark executes it three times (SCALE.md measured
    13.3 MB / 897k shuffled rows, the registry's heaviest). But all
    three consumers ask questions answerable by one groupBy(okey):
    #distinct suppliers (EXISTS other-supplier == n_supp >= 2),
    #distinct LATE suppliers (NOT EXISTS other-late == n_late_supp ==
    1), the sole late supplier's key, and its late-lineitem count
    (each late line of that supplier is one l1 row in the statement's
    semantics). One combined shuffle on (okey, skey) + two tiny rollups
    replace the semi/anti stack; answer-identical — the oracle is
    literally Q21's statement. Measured at sf0.1: 4.2 MB / 284k
    shuffled records vs the statement's 13.3 MB / 897k (3.1x less),
    1.5x wall."""
    o = catalog.load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = catalog.load_table(spark, sf_dir, "lineitem")
    lo = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_suppkey").alias("skey"),
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 75 DAY")
        ).alias("is_late"),
    )
    # Two-level aggregate instead of countDistinct: the (okey, skey)
    # pre-aggregate map-side-combines the fact down to one row per
    # order-supplier pair BEFORE the shuffle (a countDistinct would
    # expand to a second exchange per distinct column), then the tiny
    # per-order rollup answers all three of the statement's correlated
    # questions at once.
    per_supp = lo.groupBy("okey", "skey").agg(
        F.max("is_late").alias("late"),
        F.sum(F.col("is_late").cast("long")).alias("n_late_lines"),
    )
    per_order = per_supp.groupBy("okey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.col("late").cast("long")).alias("n_late_supp"),
        F.max(F.when(F.col("late"), F.col("skey"))).alias("late_skey"),
        F.sum(F.when(F.col("late"), F.col("n_late_lines")).otherwise(F.lit(0))).alias("n_late_lines"),
    )
    waiting = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    )
    s = catalog.load_table(spark, sf_dir, "supplier")
    return (
        waiting.groupBy("late_skey")
        .agg(F.sum("n_late_lines").alias("_n"))
        .join(F.broadcast(s), F.col("late_skey") == s.s_suppkey)
        .select(F.col("s_name").alias("supplier"), F.col("_n").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "supplier")
        .limit(20)
    )
