"""Full-text fuzzy search (SURVEY.md G6).

The reference serves `CALL db.index.fulltext.queryNodes(
"product_name_index", "term~") LIMIT 10` — Lucene fuzzy matching
(neo4j_service.py:71,107). Spark-first re-expression: a derived
inverted-index DataFrame (token → id) + levenshtein scoring on tokens,
top-k by (distance, id).

At 100 TB the inverted index is a materialized, bucketed-by-token
table; a query is then a point lookup on the token buckets plus a
small candidate rescoring — never a full scan of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def inverted_index(
    df: DataFrame, text_col: str = "name", id_col: str = "sku"
) -> DataFrame:
    """token → id postings: explode(split(lower(text)))."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token"),
        )
        .filter(F.length("token") > 0)
        .distinct()
    )


def fuzzy_search(
    index: DataFrame,
    term: str,
    max_distance: int = 2,
    k: int = 10,
) -> DataFrame:
    """G6 — ids whose tokens are within `max_distance` edits of term,
    scored by min distance; top-k by (distance, id). The levenshtein
    prefilter on length difference keeps the scan cheap."""
    t = term.lower()
    scored = (
        index.filter(
            (F.length("token") >= len(t) - max_distance)
            & (F.length("token") <= len(t) + max_distance)
        )
        .withColumn("distance", F.levenshtein(F.col("token"), F.lit(t)))
        .filter(F.col("distance") <= max_distance)
        .groupBy("id")
        .agg(F.min("distance").alias("distance"))
    )
    return scored.orderBy("distance", "id").limit(k)
