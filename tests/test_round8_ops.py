"""Round-8 operator semantics: MMR diversified rerank + exact-n
stratified sampling (value checks beyond the oracle hash, plus the
scale-shape assertions the docstrings promise).
"""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_mmr_rerank_semantics(spark):
    """vec_mmr_rerank — (a) rank 1 is the globally most-similar vector
    (MMR's first pick is pure relevance), (b) all five picks are
    distinct members of the top-20 prefetch, (c) the returned plan is
    the broadcast equi-join of the selection frame (no nested loop in
    the RETURNED plan — the bounded k'xk' pair frame is consumed
    inside the operator)."""
    from pyspark.sql import functions as F

    from sales_agent_graphdb_spark import catalog
    from sales_agent_graphdb_spark.operators import similarity as sim
    from sales_agent_graphdb_spark.queries.vector import (
        _MMR_PREFETCH,
        _query_vec,
        vec_mmr_rerank,
    )

    rows = vec_mmr_rerank(spark, SF_SMALL).collect()
    assert [r.sel_rank for r in rows] == [1, 2, 3, 4, 5]
    assert len({r.vec_id for r in rows}) == 5

    emb = catalog.load_table(spark, SF_SMALL, "embeddings")
    qv = _query_vec(spark, SF_SMALL)
    top = (
        emb.filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            sim.cosine(F.col("embedding"), sim.lit_vector(qv)).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(_MMR_PREFETCH)
        .collect()
    )
    top_ids = [r.vec_id for r in top]
    assert rows[0].vec_id == top_ids[0], "rank-1 must be the pure top-1"
    assert rows[0].sim == top[0].sim
    assert {r.vec_id for r in rows} <= set(top_ids)

    plan = (
        vec_mmr_rerank(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_mmr_rerank_diversifies_at_sf001(spark):
    """At sf0.01 the greedy measurably reorders: the output's sims are
    NOT monotonically decreasing (a pure top-5 would be), proving the
    diversity term changed the picks — the non-vacuousness check for
    the whole operator. (Pinned at sf0.01 where the prototype measured
    the inversion; sf0.001's tiny corpus may or may not invert.)"""
    from sales_agent_graphdb_spark.queries.vector import vec_mmr_rerank

    rows = vec_mmr_rerank(spark, "/root/testdata/sf0.01").collect()
    sims = [r.sim for r in rows]
    assert sims != sorted(sims, reverse=True), sims


def test_exact_n_sampler_counts_and_pooling(spark):
    """sample_stratified_exact_n — exactly n rows per stratum, rank
    dense 1..n, and the window input really is the hash-pooled
    fraction (the pool filter sits below the window in the plan, so
    the sort/shuffle never sees the full stratum)."""
    from pyspark.sql import functions as F

    from sales_agent_graphdb_spark.queries.curation import (
        _EXACT_N,
        sample_stratified_exact_n,
    )

    df = sample_stratified_exact_n(spark, SF_SMALL)
    rows = df.collect()
    per = {}
    for r in rows:
        per.setdefault(r.event_type, []).append(r.rn)
    assert set(per) == {"click", "error", "purchase", "signup", "view"}
    for t, rns in per.items():
        assert sorted(rns) == list(range(1, _EXACT_N + 1)), t

    plan = df._jdf.queryExecution().executedPlan().toString()
    # the md5 pool predicate must appear below the Window (a Filter on
    # the scan side), not above it.
    win_pos = plan.find("Window ")
    filt_pos = plan.find("conv(substring(md5")  # md5_mod's lowering
    assert win_pos != -1 and filt_pos != -1, plan
    assert filt_pos > win_pos, (
        "pool filter should sit BELOW (after, in toString order) the "
        "Window operator in the plan tree"
    )
    # Bonus Spark gives the rank<=n shape: WindowGroupLimit runs a
    # PARTIAL per-partition top-n BEFORE the stratum shuffle — the
    # window exchange carries at most n rows per (partition, stratum).
    assert "WindowGroupLimit" in plan, plan


def test_adaptive_filtered_ann_width_and_recall(spark):
    """ann_filtered_adaptive_topk — the adaptive width must equal the
    integer overfetch formula on the measured selectivity, stay
    strictly between the fixed probe (4) and the full scan (16) at
    this filter, and the verdict row must hold with its exact side
    equal to a directly-computed filtered top-5."""
    from pyspark.sql import functions as F

    from sales_agent_graphdb_spark import catalog
    from sales_agent_graphdb_spark.operators import similarity as sim
    from sales_agent_graphdb_spark.queries.ann_search import (
        _ADAPTIVE_BASE_PROBE,
        _ADAPTIVE_LABELS,
        ann_filtered_adaptive_topk,
    )
    from sales_agent_graphdb_spark.queries.vector import _query_vec

    row = ann_filtered_adaptive_topk(spark, SF_SMALL).collect()[0]
    emb = catalog.load_table(spark, SF_SMALL, "embeddings")
    r = emb.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("label").isin(*_ADAPTIVE_LABELS)).alias("c"),
    ).collect()[0]
    want = min(16, (_ADAPTIVE_BASE_PROBE * int(r["n"]) + int(r["c"]) - 1) // int(r["c"]))
    assert row.n_probed_cells == want
    assert 4 < row.n_probed_cells < 16
    assert row.recall_ok, row

    qv = _query_vec(spark, SF_SMALL)
    exact = (
        emb.filter(F.col("label").isin(*_ADAPTIVE_LABELS) & (F.col("vec_id") != 0))
        .select("vec_id", sim.cosine(F.col("embedding"), sim.lit_vector(qv)).alias("s"))
        .orderBy(F.col("s").desc(), "vec_id")
        .limit(5)
        .collect()
    )
    assert sorted(int(x) for x in row.exact_ids.split(",")) == sorted(
        e.vec_id for e in exact
    )
