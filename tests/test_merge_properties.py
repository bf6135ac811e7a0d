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


def test_chunker_invariants(spark):
    docs = catalog.load_table(spark, SF_SMALL, "documents")
    size, overlap = 120, 20
    chunks = chunk_documents(docs, size=size, overlap=overlap).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    by_doc: dict[int, list] = {}
    for c in chunks:
        by_doc.setdefault(c.doc_id, []).append(c)
    assert set(by_doc) == {d for d, t in texts.items() if len(t) > 0}
    stride = size - overlap
    for doc_id, cs in by_doc.items():
        cs.sort(key=lambda c: c.chunk_idx)
        text = texts[doc_id]
        # dense indices from 0
        assert [c.chunk_idx for c in cs] == list(range(len(cs)))
        # full coverage: concatenation of stride-prefixes + last chunk == text
        rebuilt = "".join(c.chunk_text[:stride] for c in cs[:-1]) + cs[-1].chunk_text
        assert rebuilt == text
        # exact overlap between consecutive chunks
        for a, b in zip(cs, cs[1:]):
            assert a.chunk_text[stride:] == b.chunk_text[: len(a.chunk_text) - stride]
