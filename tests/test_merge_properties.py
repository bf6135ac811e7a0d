"""Property tests from SURVEY.md §5: merge idempotence (applying a
merge twice ≡ once), last-wins dedup stability, chunker coverage
invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from sales_agent_graphdb_spark import catalog
from sales_agent_graphdb_spark.operators.chunker import chunk_documents
from sales_agent_graphdb_spark.operators.merge import merge_create_only, merge_overwrite
from tests.conftest import SF_SMALL


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_create_only_idempotent(spark):
    part = catalog.load_table(spark, SF_SMALL, "part").select(
        F.col("p_partkey").alias("id"), F.col("p_retailprice").alias("price")
    )
    new = part.filter(F.col("id") < 50).select("id", F.lit(1.0).alias("price"))
    once = merge_create_only(part, new, "id")
    twice = merge_create_only(once, new, "id")
    assert _rows(once) == _rows(twice)


def test_merge_overwrite_idempotent(spark):
    part = catalog.load_table(spark, SF_SMALL, "part").select(
        F.col("p_partkey").alias("id"), F.col("p_retailprice").alias("price")
    )
    new = part.filter(F.col("id") < 50).select("id", F.lit(-1.0).alias("price"))
    once = merge_overwrite(part, new, "id")
    twice = merge_overwrite(once, new, "id")
    assert _rows(once) == _rows(twice)
    # and new values actually won
    assert all(
        r.price == -1.0 for r in once.filter(F.col("id") < 50).collect()
    )
