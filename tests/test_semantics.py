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


def test_embedding_qc_flags_crafted_vectors(spark):
    """v8 — the QC flags must fire on pathologies the synthetic corpus
    doesn't contain: NaN/Inf elements, all-zero vectors, non-unit
    norms."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    rows = [
        (1, [1.0, 0.0, 0.0]),            # unit norm, clean
        (2, [0.0, 0.0, 0.0]),            # all-zero -> fail
        (3, [float("nan"), 1.0, 0.0]),   # non-finite -> fail
        (4, [float("inf"), 0.0, 0.0]),   # non-finite -> fail
        (5, [3.0, 4.0, 0.0]),            # norm 5, finite -> pass, not unit
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r.vec_id: r
        for r in similarity.embedding_qc(df).collect()
    }
    assert out[1].qc_pass and out[1].is_unit_norm
    assert not out[2].qc_pass and out[2].n_zero == 3
    assert not out[3].qc_pass and out[3].n_nonfinite == 1
    assert not out[4].qc_pass and out[4].n_nonfinite == 1
    assert out[5].qc_pass and not out[5].is_unit_norm and out[5].l2_norm == 5.0
    assert all(r.dim == 3 for r in out.values())


def test_gopher_repetition_flags_repeated_text(spark):
    """The repetition gate must reject a doc that is one 2-gram over
    and over, and keep normal prose-like text."""
    import sales_agent_graphdb_spark.queries.text as T  # noqa: PLC0415

    spam = " ".join(["buy now"] * 30)                      # top-2gram dominated
    okay = "the quick brown fox jumps over the lazy dog again and again today"
    df = spark.createDataFrame([(1, spam), (2, okay)], "doc_id long, text string")
    import sales_agent_graphdb_spark.catalog as C  # noqa: PLC0415

    orig = C.load_table
    try:
        C.load_table = lambda s, d, t: df  # the query reads only `documents`
        out = {r.doc_id: r for r in T.text_gopher_repetition(spark, "unused").collect()}
    finally:
        C.load_table = orig
    assert not out[1].keep and out[1].top_bigram_frac > 0.2
    assert out[1].dup_trigram_frac > 0.5
    assert out[2].keep


def test_global_prefix_sum_matches_single_window_and_distributes(spark):
    """w7 — the two-pass global prefix sum must equal the
    single-partition window form exactly AND actually use multiple
    range partitions (i.e. not degrade to the thing it replaces)."""
    from pyspark.sql import Window, functions as F  # noqa: PLC0415

    from sales_agent_graphdb_spark.operators.prefix_sum import global_prefix_sum

    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7 + 1).cast("int").alias("v")
    )
    two_pass = {
        r.k: r.cum for r in global_prefix_sum(df, "k", "v", "cum").collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    single = {r.k: r.cum for r in df.withColumn("cum", F.sum("v").over(w)).collect()}
    assert two_pass == single
    # "Distributes" must be asserted on the OPERATOR's plan, not on a
    # throwaway repartition of the input. The range exchange happens
    # inside the localCheckpoint materialization (not visible
    # downstream), so the observable invariant is the data-side window
    # being PARTITIONED BY _pid — a regression to one global window
    # would show an empty window partition spec instead.
    plan = (
        global_prefix_sum(df, "k", "v", "cum")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "windowspecdefinition(_pid" in plan, plan
    assert "windowspecdefinition(k" not in plan, plan


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=200),
    parts=st.integers(min_value=1, max_value=16),
)
def test_global_prefix_sum_property(spark, vals, parts):
    """prefix_sum — for any values (negatives included) and partition
    count, the two-pass result equals the sequential prefix sum."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from sales_agent_graphdb_spark.operators.prefix_sum import global_prefix_sum

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k int, v int"
    )
    got = {
        r.k: r.cum
        for r in global_prefix_sum(df, "k", "v", "cum", num_partitions=parts).collect()
    }
    acc, want = 0, {}
    for i, v in enumerate(vals):
        acc += v
        want[i] = acc
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(st.integers(min_value=-10**6, max_value=10**6), min_size=1, max_size=60),
    parts=st.integers(min_value=1, max_value=8),
)
def test_global_prefix_sum_single_exchange_property(spark, vals, parts):
    """single-exchange prefix sum — for any values (negatives included)
    and partition count, the mapInPandas form equals the sequential
    prefix sum (same contract as the two-pass form)."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from sales_agent_graphdb_spark.operators.prefix_sum import (
        global_prefix_sum_single_exchange,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k int, v int"
    )
    got = {
        r.k: r.cum
        for r in global_prefix_sum_single_exchange(
            df, "k", "v", "cum", num_partitions=parts
        ).collect()
    }
    acc, want = 0, {}
    for i, v in enumerate(vals):
        acc += v
        want[i] = acc
    assert got == want


def test_global_prefix_sum_single_exchange_plan_and_guards(spark):
    """single-exchange prefix sum — the data path has NO shuffle after
    the checkpointed range exchange (an ArrowEvalPython-free mapInPandas
    pass, no _pid window, no hash Exchange), and the integral-type /
    reserved-name guards fail loudly."""
    import pytest as _pytest
    from pyspark.sql import functions as F  # noqa: PLC0415

    from sales_agent_graphdb_spark.operators.prefix_sum import (
        global_prefix_sum_single_exchange,
    )

    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7 + 1).cast("int").alias("v")
    )
    out = global_prefix_sum_single_exchange(df, "k", "v", "cum")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the only exchange is the range repartition inside the checkpoint
    # materialization; the visible downstream plan must be narrow:
    assert "Exchange" not in plan, plan
    assert "windowspecdefinition" not in plan, plan
    assert "MapInPandas" in plan, plan
    with _pytest.raises(ValueError, match="integral"):
        global_prefix_sum_single_exchange(
            df.withColumn("v", F.col("v").cast("double")), "k", "v"
        )
    with _pytest.raises(ValueError, match="collide"):
        global_prefix_sum_single_exchange(df.withColumn("_pid", F.lit(1)), "k", "v")


def test_bm25_phrase_requires_adjacency(spark):
    """bm25_rank(ngrams=2) — a quoted phrase scores only docs where the
    words are ADJACENT in order; scrambled word order gets zero phrase
    contribution; unigram scores are unchanged by widening the index;
    and a phrase term without ngrams>=2 fails loudly."""
    import pytest as _pytest

    from sales_agent_graphdb_spark.operators.fulltext import bm25_rank

    docs = spark.createDataFrame(
        [
            (1, "table hash join plan"),      # phrase adjacent
            (2, "table join hash plan"),      # words present, not adjacent
            (3, "plan scan sort merge"),      # neither
        ],
        "doc_id long, text string",
    )
    scores = {
        r.doc_id: r.score
        for r in bm25_rank(docs, ["table hash"], k=10, ngrams=2).collect()
    }
    assert set(scores) == {1}, scores
    assert scores[1] > 0.0
    # unigram-only query: identical result with and without the wider index
    uni1 = {r.doc_id: r.score for r in bm25_rank(docs, ["plan"], k=10).collect()}
    uni2 = {
        r.doc_id: r.score
        for r in bm25_rank(docs, ["plan"], k=10, ngrams=2).collect()
    }
    assert uni1 == uni2
    with _pytest.raises(ValueError, match="phrase"):
        bm25_rank(docs, ["table hash"], k=10)
