"""Similarity-search queries: brute-force baseline is
`v1_knn_cosine_top5` (vector.py); these are the ANN scale paths.
Rows-only for the driver (approximation is seed-dependent); pytest
pins recall against the exact top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sales_agent_graphdb_spark import catalog
from sales_agent_graphdb_spark.operators import ann
from sales_agent_graphdb_spark.queries.vector import _query_vec
from sales_agent_graphdb_spark.registry import register


@register("ann_lsh_topk", oracle=None)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH top-5 (8 tables × 4 planes) — candidates
    from bucket collisions, exact-cosine rerank. pytest asserts
    recall ≥ 0.6 vs exact top-5 at sf0.001 (random 64-dim embeddings
    are a worst case for LSH; planted-near-dup recall is 1.0)."""
    emb = catalog.load_table(spark, sf_dir, "embeddings")
    return ann.hyperplane_lsh_topk(emb, _query_vec(spark, sf_dir), k=5)


@register("ann_ivf_topk", oracle=None)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-5 (16 cells, probe 4): coarse-quantize, prune 12/16 of
    the corpus, exact rerank. The cell filter is the partition-pruning
    path at 100 TB."""
    emb = catalog.load_table(spark, sf_dir, "embeddings")
    return ann.ivf_topk(emb, _query_vec(spark, sf_dir), k=5, n_cells=16, n_probe=4)
