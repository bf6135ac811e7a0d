"""Physical-plan probes for the session's ranked-retrieval / curation
operators — the 100 TB evidence that complements the value checks in
test_oracle_parity.py: broadcasts where the design says broadcast,
top-k as TakeOrderedAndProject (never a global sort), and no
nested-loop join anywhere in the candidate-generation paths.
"""

from __future__ import annotations

from tests.conftest import SF_SMALL


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bm25_plan_broadcasts_and_topk(spark):
    from sales_agent_graphdb_spark.queries.text import text_bm25_search

    plan = _plan(text_bm25_search(spark, SF_SMALL))
    # df table and corpus stats are tiny → broadcast, not shuffled.
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    # top-k is TakeOrderedAndProject, not Sort + CollectLimit.
    assert "TakeOrderedAndProject" in plan, plan
    # the corpus-side joins must not degrade to a cartesian product:
    # the only nested-loop allowed is the single-row stats crossJoin.
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan


def test_decontaminate_plan_broadcasts_eval_side(spark):
    from sales_agent_graphdb_spark.queries.curation import (
        decontaminate_ngram_overlap,
    )

    plan = _plan(decontaminate_ngram_overlap(spark, SF_SMALL))
    # the eval (benchmark) side is the small side and must broadcast —
    # at 100 TB the train side never shuffles for this check.
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_stratified_sample_is_pure_filter(spark):
    from sales_agent_graphdb_spark.queries.curation import (
        sample_stratified_hash,
    )

    plan = _plan(sample_stratified_hash(spark, SF_SMALL))
    # no shuffle other than the final presentation sort: the sample
    # itself is a map-side filter.
    assert "Exchange hashpartitioning" not in plan, plan


def test_interval_join_batch_shape(spark):
    """The batch twin of st_stream_interval_join built through the
    PIPELINE'S OWN join condition (streaming/pipelines.py:
    interval_join_cond) must keep an equi-key on user_id — Spark plans
    a hash/merge join with the time-range as residual predicate, never
    a nested loop. Sharing the condition means a regression that drops
    the equi-key from the real stream fails HERE."""
    from pyspark.sql import functions as F

    from sales_agent_graphdb_spark import catalog
    from sales_agent_graphdb_spark.streaming.pipelines import interval_join_cond

    ev = catalog.load_table(spark, SF_SMALL, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user_id"), F.col("ts").alias("view_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user_id"), F.col("ts").alias("buy_ts")
    )
    j = v.join(p, interval_join_cond(), "inner")
    plan = _plan(j)
    assert "NestedLoop" not in plan, plan


def test_sorted_scan_pruning_pushdown(spark):
    """s10 — the range predicate must reach the parquet scan of the
    sorted layout (PushedFilters with the l_shipdate bounds) and the
    scan must be column-pruned to the two referenced columns; that is
    the mechanism row-group skipping rides on."""
    from sales_agent_graphdb_spark.queries.sources_io import s10_sorted_scan_pruning

    df = s10_sorted_scan_pruning(spark, SF_SMALL)
    plan = _plan(df)
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert any("PushedFilters" in l and "GreaterThanOrEqual(l_shipdate" in l for l in scans), plan
    assert any("ReadSchema" in l and "l_extendedprice" in l and "l_orderkey" not in l for l in scans), plan
