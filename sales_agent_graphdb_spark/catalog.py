"""Catalog: testdata loaders + derived reference-shaped views.

The driver testdata is a TPC-H-ish star schema (see FIXTURES.md §1).
The reference system's e-commerce tables (SURVEY.md §1) are derived
from it *in-query* (FIXTURES.md §2) so every operator has an
oracle-checkable fixture:

  products      <- part      (sku/name/category/price/stock)
  categories    <- distinct p_brand            (graph vertices)
  in_category   <- (p_partkey -> p_brand)      (graph edges)
  customers     <- customer  (+ synthesized unique email)
  ref_orders    <- orders    (status mapped to the OrderStatus enum,
                              reference models.py:8-13)
  order_items   <- lineitem  (order_id/product_id/qty/unit_price)
  chat_messages <- events    (session_id=user_id, content=props)

All derivations are pure column expressions — they stay inside
whole-stage codegen and add no shuffle; Catalyst prunes unused columns
back to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Reference OrderStatus enum (models.py:8-13) mapped from TPC-H-ish
# o_orderstatus codes.
STATUS_MAP = {"O": "PENDING", "P": "PROCESSING", "F": "DELIVERED"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Parquet => pushdown + pruning for free.

    ``events.ts`` has shipped in two encodings across testdata
    generations: TIMESTAMP(NANOS) (Spark rejects by default — read the
    nanos as long and floor-truncate to µs, matching DuckDB) and plain
    TIMESTAMP_NTZ (read natively). Detect from the file schema and
    normalize both to session-TZ TimestampType so downstream window /
    watermark / oracle code sees one type regardless of generation."""
    if name == "events":
        path = f"{sf_dir}/{name}.parquet"
        ensure_events_readable(spark, path)
        return normalize_events_ts(spark.read.parquet(path))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Paths already probed for the TIMESTAMP(NANOS) encoding this session.
_NANOS_PROBED: set[str] = set()


def ensure_events_readable(spark: SparkSession, path: str) -> None:
    """Enable ``nanosAsLong`` ONLY if this events file actually needs it
    (TIMESTAMP(NANOS) encoding). The flag is session-global; setting it
    unconditionally would silently turn any OTHER table's future nanos
    column into a bigint instead of the loud read-time error Spark
    gives by default — so probe first, set only on demand."""
    if path in _NANOS_PROBED:
        return
    try:
        spark.read.parquet(path).schema
    except Exception:  # AnalysisException: Illegal Parquet type TIMESTAMP(NANOS)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    _NANOS_PROBED.add(path)


def normalize_events_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """THE events-ts normalization — long-encoded nanos floor-truncate
    to µs (integer division: ns values ~1.7e18 overflow double
    precision), native timestamps cast to session-TZ TimestampType.
    Batch loader and BOTH streaming sources must share this one
    definition: batch/stream hash parity rests on identical truncation
    (review r03: it was copy-pasted in three files)."""
    if df.schema[ts_col].dataType.simpleString() == "bigint":
        return df.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
        )
    return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


# ---------------------------------------------------------------------------
# Reference-shaped derived views (FIXTURES.md §2)
# ---------------------------------------------------------------------------


def products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """products table (reference models.py:28-42) derived from part."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("id"),
        F.col("p_partkey").cast("string").alias("sku"),
        F.col("p_name").alias("name"),
        F.col("p_brand").alias("category"),
        F.col("p_type").alias("description"),
        F.col("p_retailprice").alias("price"),
        F.col("p_size").alias("stock_quantity"),
    )


def categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Category vertices (reference neo4j_service.py:64-66)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(F.col("p_brand").alias("category_name")).distinct()


def in_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(:Product)-[:IN_CATEGORY]->(:Category) edges (neo4j_service.py:66)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").cast("string").alias("sku"),
        F.col("p_brand").alias("category_name"),
    )


def customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customers table (models.py:15-26); email synthesized for
    uniqueness / semi-join tests."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("id"),
        F.concat(F.col("c_custkey").cast("string"), F.lit("@x.test")).alias("email"),
        F.col("c_name").alias("full_name"),
        F.lit("customer").alias("role"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
    )


def ref_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders table (models.py:44-55) with the OrderStatus enum mapping."""
    o = load_table(spark, sf_dir, "orders")
    status = F.col("o_orderstatus")
    mapped = F.lit("PENDING")  # default for unknown codes
    for code, enum in reversed(list(STATUS_MAP.items())):
        mapped = F.when(status == code, enum).otherwise(mapped)
    return o.select(
        F.col("o_orderkey").alias("id"),
        F.col("o_custkey").alias("customer_id"),
        mapped.alias("status"),
        F.col("o_totalprice").alias("total_amount"),
        F.col("o_orderdate").alias("created_at"),
        F.col("o_orderpriority").alias("priority"),
    )


def order_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """order_items table (models.py:57-72) derived from lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_partkey").alias("product_id"),
        F.col("l_linenumber").alias("line_no"),
        F.col("l_partkey").cast("string").alias("sku"),
        F.col("l_quantity").alias("quantity"),
        F.col("l_extendedprice").alias("ext_price"),
        F.col("l_discount").alias("discount"),
    )


def chat_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """chat_messages(session_id, turn, role, content, ts) derived from
    events (reference chat_service.py:25-30 Redis message lists)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        F.col("user_id").alias("session_id"),
        F.col("event_id").alias("turn"),
        F.when(F.col("event_id") % 2 == 0, "user").otherwise("assistant").alias("role"),
        F.col("props").alias("content"),
        F.col("ts").alias("ts"),
    )
