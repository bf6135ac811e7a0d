"""Text chunking operator (SURVEY.md F11).

The reference chunks every document with
RecursiveCharacterTextSplitter(chunk_size=1000, chunk_overlap=200)
before embedding (db_service.py:209-212,322-328). Here chunking is a
fixed-stride character splitter expressed entirely with built-in
higher-order functions (sequence → transform → explode): no UDF, no
Python in the hot path, and the chunk set is a deterministic function
of (text, size, overlap) so a DuckDB generate_series oracle can verify
it exactly.

Invariants (property-tested): every character of the input is covered
by ≥1 chunk; consecutive chunks overlap by exactly ``overlap`` chars;
chunk_idx is dense from 0; no chunk is fully contained in another (a
start with fewer than ``overlap + 1`` remaining chars would duplicate
the previous chunk's tail verbatim — inflating chunk counts and
seeding duplicate embeddings downstream — so such starts are not
emitted).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_expr(text: Column, size: int = 1000, overlap: int = 200) -> Column:
    """array<struct<chunk_idx:int, chunk_text:string>> for one text
    column. Start positions are 0, stride, 2·stride, … while more than
    ``overlap`` chars remain past the start (stride = size - overlap) —
    a start with ≤ overlap remaining chars would yield a chunk fully
    contained in the previous one (pure duplicate text), so it is not
    emitted; coverage still holds because those chars sit inside the
    previous chunk."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap
    # floor((len - overlap - 1)/stride), clamped at 0: the last start
    # with > overlap chars remaining. Cast-truncation == floor for the
    # non-negative case; greatest() clamps the negative short-text case.
    n_minus_1 = F.greatest(
        F.lit(0), ((F.length(text) - 1 - overlap) / stride).cast("int")
    )
    idx = F.sequence(F.lit(0), n_minus_1)
    mk = lambda i: F.struct(  # noqa: E731
        i.cast("int").alias("chunk_idx"),
        text.substr(i * stride + 1, F.lit(size)).alias("chunk_text"),
    )
    return F.when(F.length(text) > 0, F.transform(idx, mk)).otherwise(
        F.array().cast("array<struct<chunk_idx:int,chunk_text:string>>")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 1000,
    overlap: int = 200,
) -> DataFrame:
    """V5 ingestion step: documents → chunks(doc_id, chunk_idx,
    chunk_text, chunk_id). chunk_id is a content-derived surrogate
    (md5), never monotonically_increasing_id — deterministic under any
    parallelism/partitioning."""
    chunks = chunk_expr(F.col(text_col), size, overlap)
    exploded = df.select(F.col(id_col), F.explode(chunks).alias("c")).select(
        id_col,
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.chunk_text").alias("chunk_text"),
    )
    return exploded.withColumn(
        "chunk_id",
        F.md5(F.concat_ws("\x1f", F.col(id_col).cast("string"), F.col("chunk_idx").cast("string"), F.col("chunk_text"))),
    )


def duckdb_chunk_sql(size: int, overlap: int, table: str = "documents") -> str:
    """The equivalent DuckDB chunking (generate_series lateral join)."""
    stride = size - overlap
    # generate_series as a scalar (list-returning) function + unnest:
    # DuckDB's table-function form can't take lateral column refs.
    return f"""
    WITH c AS (
      SELECT doc_id, text,
             unnest(generate_series(0,
               greatest(0, (length(text) - 1 - {overlap}) // {stride}))) AS i
      FROM {table} WHERE length(text) > 0)
    SELECT doc_id, CAST(i AS INT) AS chunk_idx,
           substr(text, CAST(i AS INT) * {stride} + 1, {size}) AS chunk_text
    FROM c
    """
