"""CSV / JSON connectors (SURVEY.md §2.1, S1–S4).

The reference moves product data through a CSV file with **two reader
dialects** (SURVEY.md §1.5): the golden-copy header
``id,sku,name,category,description,price,stock_quantity,image_url,
product_url`` (backend/data/products.csv:1, read by
neo4j_service.py:135-140) and the scraper-writer header
``sku,product_name,price,category_name,url,image_url,description``
(product_scraper.py:223, read by seed_products.py:30-34). Scraper JSON
lands either as an envelope ``{timestamp, source_url, posts_scraped,
data: [...]}`` (facebook_scraper.py:66-76) or a bare list
(website_scraper.py:103-104); both shapes are handled at
db_service.py:413-416.

Here each dialect is an explicit ``StructType`` + rename map over
``spark.read.csv`` / ``spark.read.json`` — schema-on-read, no
inference (inference = an extra full scan and nondeterministic typing
at 100 TB). Sinks are the matching ``df.write`` calls. All connectors
normalize to ONE canonical product schema so downstream operators
never see a dialect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Canonical product schema (reference models.py:28-42).
PRODUCT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("sku", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("stock_quantity", T.IntegerType()),
        T.StructField("image_url", T.StringType()),
        T.StructField("product_url", T.StringType()),
    ]
)

# Scraper-writer dialect (product_scraper.py:223).
SCRAPER_CSV_SCHEMA = T.StructType(
    [
        T.StructField("sku", T.StringType()),
        T.StructField("product_name", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("category_name", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("image_url", T.StringType()),
        T.StructField("description", T.StringType()),
    ]
)

# scraper column -> canonical column (seed_products.py:30-34 mapping).
SCRAPER_RENAMES = {
    "product_name": "name",
    "category_name": "category",
    "url": "product_url",
}


def read_products_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1 — golden-copy dialect reader (neo4j_service.py:129-145),
    set-oriented: one distributed scan replaces the reference's
    row-at-a-time DictReader."""
    return spark.read.csv(path, header=True, schema=PRODUCT_SCHEMA)


def read_scraper_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1 — scraper dialect reader (seed_products.py:20-52): explicit
    schema + rename map onto the canonical columns."""
    df = spark.read.csv(path, header=True, schema=SCRAPER_CSV_SCHEMA)
    for src, dst in SCRAPER_RENAMES.items():
        df = df.withColumnRenamed(src, dst)
    return df


def write_products_csv(df: DataFrame, path: str) -> None:
    """S2 — CSV sink, full overwrite with fixed field order
    (product_scraper.py:221-231)."""
    df.select([f.name for f in PRODUCT_SCHEMA.fields]).write.mode("overwrite").csv(
        path, header=True
    )


def write_scraper_csv(df: DataFrame, path: str) -> None:
    """S2 — CSV sink in the scraper dialect (inverse rename)."""
    out = df
    for src, dst in SCRAPER_RENAMES.items():
        out = out.withColumnRenamed(dst, src)
    out.select([f.name for f in SCRAPER_CSV_SCHEMA.fields]).write.mode(
        "overwrite"
    ).csv(path, header=True)


# ---------------------------------------------------------------------------
# Scraper JSON envelope (S3/S4)
# ---------------------------------------------------------------------------

POST_SCHEMA = T.StructType(
    [
        T.StructField("post_id", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("likes_count", T.LongType()),
    ]
)

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.StringType()),
        T.StructField("source_url", T.StringType()),
        T.StructField("posts_scraped", T.LongType()),
        T.StructField("data", T.ArrayType(POST_SCHEMA)),
    ]
)


def write_scraper_json(posts: DataFrame, path: str, source_url: str) -> None:
    """S4 — JSON sink with the ``{timestamp, source_url, posts_scraped,
    data}`` envelope (facebook_scraper.py:66-76). The envelope is built
    set-side (collect_list into one struct row), not driver-side."""
    env = posts.agg(
        F.lit("1970-01-01T00:00:00").alias("timestamp"),  # deterministic stamp
        F.lit(source_url).alias("source_url"),
        F.count(F.lit(1)).alias("posts_scraped"),
        F.collect_list(F.struct(*[F.col(f.name) for f in POST_SCHEMA.fields])).alias(
            "data"
        ),
    )
    env.write.mode("overwrite").json(path)


def read_scraper_json(spark: SparkSession, path: str) -> DataFrame:
    """S3 — JSON source with envelope unwrap (db_service.py:242-251,
    397-416) and dual-shape handling (db_service.py:413-416): an
    envelope file contributes explode(data); a bare-list file
    (website_scraper.py:103-104) parses as top-level post rows with
    ``data IS NULL`` under the combined schema and is unioned in as-is.
    (A plain explode would silently DROP bare-list rows — explode
    eliminates NULL arrays.)"""
    combined = T.StructType(ENVELOPE_SCHEMA.fields + POST_SCHEMA.fields)
    raw = spark.read.json(path, schema=combined)
    post_cols = [f.name for f in POST_SCHEMA.fields]
    enveloped = (
        raw.filter(F.col("data").isNotNull())
        .select(F.explode(F.col("data")).alias("post"))
        .select("post.*")
    )
    bare = raw.filter(F.col("data").isNull()).select(*post_cols)
    return enveloped.unionByName(bare)
