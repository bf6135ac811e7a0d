"""Ingestion-pipeline queries (SURVEY.md §3.3, V5, V7, S7, G4): the
master ingestion re-expressed as one set-oriented batch job, plus the
HTML-cleaning source step and the wipe/recreate maintenance ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_agent_graphdb_spark import catalog
from sales_agent_graphdb_spark.operators import chunker, embed
from sales_agent_graphdb_spark.registry import register

CHUNK_SIZE = 200  # reference uses 1000/200 (db_service.py:209-212);
CHUNK_OVERLAP = 40  # scaled 5× down so sf0.01 docs (median ~300 chars)
#                     actually produce multi-chunk explosions.


@register(
    "v5_ingest_chunk_embed",
    oracle=f"""
    WITH c AS ({chunker.duckdb_chunk_sql(CHUNK_SIZE, CHUNK_OVERLAP)})
    SELECT doc_id, chunk_idx,
           md5(CAST(doc_id AS VARCHAR) || chr(31) || CAST(chunk_idx AS VARCHAR)
               || chr(31) || chunk_text) AS chunk_id,
           length(chunk_text) AS n_chars,
           {embed.duckdb_embed_dim_sql("chunk_text", 0)} AS e0
    FROM c ORDER BY doc_id, chunk_idx
    """,
)
def v5_ingest_chunk_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V5 — the document-ingestion pipeline end-to-end (reference
    db_service.py:253-333,391-433: extract → chunk → embed → store),
    set-oriented: chunk explosion via built-in higher-order functions,
    content-hash chunk ids (deterministic under any parallelism),
    Arrow-batched embedding. One narrow scan → explode → project; the
    only wide op a final optional write."""
    docs = catalog.load_table(spark, sf_dir, "documents")
    chunks = chunker.chunk_documents(
        docs, size=CHUNK_SIZE, overlap=CHUNK_OVERLAP
    )
    vec = embed.embed_col(F.col("chunk_text"), dim=4)
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "chunk_id",
        F.length("chunk_text").alias("n_chars"),
        vec.getItem(0).alias("e0"),
    ).orderBy("doc_id", "chunk_idx")


@register(
    "s7_html_clean",
    oracle="""
    WITH html AS (
      SELECT doc_id,
             '<html><head><script>var x=1;</script></head><body><nav>menu</nav><p>'
               || text || '</p><footer>foot</footer></body></html>' AS h
      FROM documents WHERE doc_id < 50),
    stripped AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(regexp_replace(regexp_replace(h,
                 '(?s)<script[^>]*>.*?</script>', '', 'g'),
                 '(?s)<style[^>]*>.*?</style>', '', 'g'),
                 '(?s)<nav[^>]*>.*?</nav>', '', 'g'),
                 '(?s)<header[^>]*>.*?</header>', '', 'g'),
                 '(?s)<footer[^>]*>.*?</footer>', '', 'g'),
                 '(?s)<aside[^>]*>.*?</aside>', '', 'g') AS h
      FROM html)
    SELECT doc_id, trim(regexp_replace(h, '<[^>]+>', ' ', 'g')) AS cleaned
    FROM stripped ORDER BY doc_id
    """,
)
def s7_html_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 — HTML source cleaning (reference website_scraper.py:47-66:
    BeautifulSoup strips script/style/nav/header/footer/aside then
    text). A deterministic HTML envelope is wrapped around each doc
    text, then stripped with the regexp_replace chain — the
    ingestion-side UDF surface without a Python UDF."""
    docs = catalog.load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    html = F.concat(
        F.lit("<html><head><script>var x=1;</script></head><body><nav>menu</nav><p>"),
        F.col("text"),
        F.lit("</p><footer>foot</footer></body></html>"),
    )
    no_blocks = html
    for tag in ("script", "style", "nav", "header", "footer", "aside"):
        no_blocks = F.regexp_replace(
            no_blocks, rf"(?s)<{tag}[^>]*>.*?</{tag}>", ""
        )
    cleaned = F.trim(F.regexp_replace(no_blocks, r"<[^>]+>", " "))
    return docs.select("doc_id", cleaned.alias("cleaned")).orderBy("doc_id")


@register(
    "v7_wipe_recreate",
    oracle="""
    SELECT CAST(NULL AS BIGINT) AS vec_id, CAST(NULL AS INT) AS label
    WHERE FALSE
    """,
)
def v7_wipe_recreate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V7/G4 — collection wipe + recreate (reference
    db_service.py:435-464, neo4j_service.py:109-111): the batch engine
    form is an overwrite-with-empty preserving schema. Returns the
    recreated (empty, correctly-typed) table."""
    emb = catalog.load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    return emb.filter(F.lit(False))


@register(
    "ingest_invalidate_pipeline",
    oracle=f"""
    WITH c AS ({chunker.duckdb_chunk_sql(CHUNK_SIZE, CHUNK_OVERLAP)})
    SELECT 'collection' AS entity, doc_id AS key, CAST(COUNT(*) AS BIGINT) AS n
    FROM c WHERE doc_id < 100 GROUP BY doc_id
    UNION ALL
    SELECT 'cache_after' AS entity, CAST(-1 AS BIGINT) AS key,
           CAST((SELECT COUNT(*) FROM embeddings WHERE FALSE) AS BIGINT) AS n
    ORDER BY entity, key
    """,
)
def ingest_invalidate_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest→cache-invalidation composition (reference admin.py:129,
    144,210,237,255: every ingestion clears the semantic cache). One
    batch flow: chunk+ingest docs (doc_id < 100) into the collection,
    then wipe the semantic cache; the returned end state is the per-doc
    collection chunk counts plus the post-wipe cache count (0) — both
    stages are actually evaluated, so the check covers the composition,
    not just the parts."""
    docs = catalog.load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    chunks = chunker.chunk_documents(docs, size=CHUNK_SIZE, overlap=CHUNK_OVERLAP)
    collection = (
        chunks.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("collection").alias("entity"),
            F.col("doc_id").alias("key"),
            F.col("n"),
        )
    )
    cache = catalog.load_table(spark, sf_dir, "embeddings")
    cache_after = cache.filter(F.lit(False))  # the wipe (v7 semantics)
    cache_row = cache_after.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("cache_after").alias("entity"),
        F.lit(-1).cast("long").alias("key"),
        F.col("n"),
    )
    return collection.unionByName(cache_row).orderBy("entity", "key")
