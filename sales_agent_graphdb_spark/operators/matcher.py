"""Multi-stage fallback product matcher (SURVEY.md P5).

The reference tries progressively looser matches until one stage
returns rows — exact name → substring → both-of-first-two-words →
first-word (tools.py:31-85, products.py:13-60), issuing up to four
sequential SQL queries. Set-oriented re-expression: score every row
with its best (lowest) matching stage in ONE scan, take the global
minimum stage via a 1-row broadcast join, and keep the rows at that
stage — first-hit-wins semantics without sequential round-trips, and
the scan parallelizes over any number of partitions at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stage_col(name_col: str, query: str) -> F.Column:
    """Best matching stage (1=exact, 2=substring, 3=two-word AND,
    4=first-word) for one query string; null = no match at any stage."""
    q = query.strip().lower()
    words = q.split()
    w0 = words[0] if words else q
    w1 = words[1] if len(words) > 1 else w0
    c = F.lower(F.col(name_col))
    return (
        F.when(c == q, 1)
        .when(c.contains(q), 2)
        .when(c.contains(w0) & c.contains(w1), 3)
        .when(c.contains(w0), 4)
    )


def multistage_match(df: DataFrame, query: str, name_col: str = "name") -> DataFrame:
    """Rows matching at the best stage that matched anything, with a
    ``match_stage`` column. Empty result = all four stages missed."""
    scored = df.withColumn("match_stage", stage_col(name_col, query)).filter(
        F.col("match_stage").isNotNull()
    )
    best = scored.agg(F.min("match_stage").alias("best_stage"))
    return (
        scored.join(F.broadcast(best), scored.match_stage == best.best_stage)
        .drop("best_stage")
    )


def duckdb_stage_sql(name_expr: str, query: str) -> str:
    """The identical stage cascade as DuckDB SQL (oracle parity).
    LIKE metacharacters in the query are escaped (ESCAPE '\\') so the
    oracle's substring test stays LITERAL, matching Spark's
    Column.contains — a '%' or '_' in the query must not become a
    wildcard on only one side."""
    q = query.strip().lower().replace("'", "''")

    def _like(s: str) -> str:
        return s.replace("\\", "\\\\").replace("%", r"\%").replace("_", r"\_")

    like = _like(q)
    words = q.split()
    w0 = _like(words[0]) if words else like
    w1 = _like(words[1]) if len(words) > 1 else w0
    c = f"lower({name_expr})"
    esc = "ESCAPE '\\'"
    return (
        f"CASE WHEN {c} = '{q}' THEN 1 "
        f"WHEN {c} LIKE '%{like}%' {esc} THEN 2 "
        f"WHEN {c} LIKE '%{w0}%' {esc} AND {c} LIKE '%{w1}%' {esc} THEN 3 "
        f"WHEN {c} LIKE '%{w0}%' {esc} THEN 4 END"
    )
