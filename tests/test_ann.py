"""ANN recall pinned against exact brute-force top-k."""

from __future__ import annotations

from sales_agent_graphdb_spark import catalog
from sales_agent_graphdb_spark.operators import ann, similarity
from sales_agent_graphdb_spark.queries.vector import _query_vec

SF = "/root/testdata/sf0.001"


def _exact_topk(spark, k):
    emb = catalog.load_table(spark, SF, "embeddings")
    return {r.vec_id for r in similarity.knn(emb, _query_vec(spark, SF), k=k).collect()}


def test_lsh_recall(spark):
    emb = catalog.load_table(spark, SF, "embeddings")
    got = {
        r.vec_id
        for r in ann.hyperplane_lsh_topk(emb, _query_vec(spark, SF), k=10).collect()
    }
    exact = _exact_topk(spark, 10)
    # Random 64-dim embeddings are LSH's worst case; still the query's
    # own vector (sim=1.0) and near neighbors must collide.
    assert 0 in got, "query vector must collide with its own buckets"
    assert len(got & exact) / len(exact) >= 0.3
    assert len(got) <= 10


def test_ivf_recall(spark):
    emb = catalog.load_table(spark, SF, "embeddings")
    got = {
        r.vec_id
        for r in ann.ivf_topk(
            emb, _query_vec(spark, SF), k=10, n_cells=16, n_probe=8
        ).collect()
    }
    exact = _exact_topk(spark, 10)
    assert 0 in got
    assert len(got & exact) / len(exact) >= 0.3


def test_ivf_assign_covers_all_cells_probed(spark):
    emb = catalog.load_table(spark, SF, "embeddings")
    cents = ann._ivf_centroids(emb, 8, "vec_id", "embedding")
    assigned = ann.ivf_assign(emb, cents)
    cells = {r.cell for r in assigned.select("cell").distinct().collect()}
    assert cells <= set(range(8))
