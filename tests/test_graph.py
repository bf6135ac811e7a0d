"""Graph-analytics invariants: PageRank mass conservation, CC label
correctness on a known topology, degree totals."""

from __future__ import annotations

from pyspark.sql import functions as F

from sales_agent_graphdb_spark import catalog
from sales_agent_graphdb_spark.operators import graph

SF = "/root/testdata/sf0.001"


def _edges(spark):
    return catalog.in_category(spark, SF).select(
        F.col("sku").alias("src"), F.col("category_name").alias("dst")
    )


def test_pagerank_mass_and_ordering(spark):
    e = _edges(spark)
    ranks = graph.pagerank(e, n_iter=10)
    rows = ranks.collect()
    n = len(rows)
    total = sum(r["rank"] for r in rows)
    # Σ rank ≈ N (damping + dangling redistribution conserve mass)
    assert abs(total - n) / n < 0.05, (total, n)
    # every category (in-degree >> 0, out-degree 0) outranks every
    # product (in-degree 0): sinks accumulate their stars' mass
    by_id = {r.id: r["rank"] for r in rows}
    cats = {r.category_name for r in catalog.categories(spark, SF).collect()}
    prod_max = max(v for k, v in by_id.items() if k not in cats)
    cat_min = min(v for k, v in by_id.items() if k in cats)
    assert cat_min > prod_max


def test_connected_components_star_topology(spark):
    """Without bridges the product→category graph is one star per
    category: every vertex's component must equal the min label within
    its own star, and two products of different categories must land
    in different components."""
    e = _edges(spark)
    cc = graph.connected_components(e)
    comp = {r.id: r.component for r in cc.collect()}
    prods = catalog.in_category(spark, SF).collect()
    by_cat: dict[str, list[str]] = {}
    for r in prods:
        by_cat.setdefault(r.category_name, []).append(r.sku)
    for cat, skus in by_cat.items():
        expected = min([cat, *skus])  # min string label in the star
        assert comp[cat] == expected
        for s in skus:
            assert comp[s] == expected


def test_degrees_total_equals_edges(spark):
    e = _edges(spark)
    d = graph.degrees(e)
    n_edges = e.count()
    sums = d.agg(
        F.sum("out_degree").alias("o"), F.sum("in_degree").alias("i")
    ).collect()[0]
    assert sums.o == n_edges and sums.i == n_edges
