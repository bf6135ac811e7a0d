"""Semantic invariants: cache-threshold monotonicity (V2), router
precedence, multistage-matcher stage ordering."""

from __future__ import annotations

from sales_agent_graphdb_spark import catalog
from sales_agent_graphdb_spark.operators import matcher, similarity
from sales_agent_graphdb_spark.plans import graph_planner, router
from sales_agent_graphdb_spark.queries.vector import _query_vec

SF = "/root/testdata/sf0.001"


def test_cache_threshold_monotonic(spark):
    """V2 — raising the threshold can only shrink the hit set, and the
    hit at threshold t has sim >= t (semantic_cache.py:27-58)."""
    emb = catalog.load_table(spark, SF, "embeddings")
    q = _query_vec(spark, SF, vec_id=3)
    prev_hits = None
    for t in (0.0, 0.2, 0.4, 0.8, 0.99):
        hits = similarity.semantic_cache_probe(emb, q, threshold=t).collect()
        assert len(hits) <= 1
        for h in hits:
            assert h.sim >= t
        if prev_hits is not None:
            assert len(hits) <= prev_hits
        prev_hits = len(hits)
    # threshold 0 with the query vector itself present => always a hit
    assert similarity.semantic_cache_probe(emb, q, threshold=0.0).count() == 1


def test_router_precedence():
    """Order intents outrank knowledge intents (agent_graph.py:283-299):
    'cancel my order' must route to cancel_order even though 'order'
    also matches order_form, and a price question with product nouns
    routes graph_db, not vector_db."""
    assert router.route("please cancel my order") == "cancel_order"
    assert router.route("I want to order a widget") == "order_form"
    assert router.route("what is the price of the red widget") == "graph_db"
    assert router.route("tell me about your facebook posts") == "vector_db"
    assert router.route("hello there") == "general"
    assert router.route("what is my order status") == "check_order_status"


def test_planner_template_selection():
    assert graph_planner.plan_for("a product named widgit").template == "fuzzy_name"
    assert graph_planner.plan_for('find "hot rod"').param == "hot rod"
    p = graph_planner.plan_for("show me Brand#3 products")
    assert (p.template, p.param) == ("category", "brand#3")
    assert graph_planner.plan_for("show me all of the").template == "broad"


def test_multistage_exact_beats_substring(spark):
    """P5 — when an exact match exists, looser stages must not fire
    (tools.py:31-85 first-hit-wins)."""
    p = catalog.products(spark, SF).select("id", "name")
    rows = matcher.multistage_match(p, "red widget", name_col="name").collect()
    assert rows and all(r.match_stage == 1 for r in rows)
    assert all(r.name.lower() == "red widget" for r in rows)
    # reversed word order cannot match exactly or as substring => stage 3
    rows3 = matcher.multistage_match(p, "widget red", name_col="name").collect()
    assert rows3 and all(r.match_stage == 3 for r in rows3)
    # no stage matches => empty
    assert matcher.multistage_match(p, "zzqx", name_col="name").count() == 0


def test_approx_percentile_tracks_exact(spark):
    """pct_approx_value (sketch, the 100 TB path) emits per-type
    booleans verifying the GK rank guarantee in-plan (r03 redesign);
    every verdict must be TRUE and the group counts must match the
    exact-percentile query's."""
    from sales_agent_graphdb_spark.registry import all_queries

    qs = all_queries()
    exact = {r.event_type: r for r in qs["pct_exact_disc"].fn(spark, SF).collect()}
    approx = {r.event_type: r for r in qs["pct_approx_value"].fn(spark, SF).collect()}
    assert set(exact) == set(approx) and exact
    for t, a in approx.items():
        assert a.n_events == exact[t].n_events
        assert a.p50_ok and a.p90_ok and a.p99_ok, f"{t}: {a}"
