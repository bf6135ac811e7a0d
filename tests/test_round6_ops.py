"""Round-6 additions: SQL front-end family plan probes and perf-twin
verdict sanity. Correctness of the SQL statements themselves is
certified by test_oracle_parity (the statement IS the oracle); these
tests pin the PHYSICAL shapes the docstrings claim."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_sql_window_partitions_on_custkey(spark):
    from sales_agent_graphdb_spark.queries.relational import sql_api_window_topn

    plan = _plan(sql_api_window_topn(spark, SF_SMALL))
    assert "Window" in plan
    # the rank window must hash-partition on the customer key, never
    # collapse to a global single-partition window
    assert "hashpartitioning(o_custkey" in plan, plan


def test_sql_exists_in_decorrelates_to_anti_and_semi(spark):
    from sales_agent_graphdb_spark.queries.relational import sql_api_exists_in

    plan = _plan(sql_api_exists_in(spark, SF_SMALL))
    assert "LeftAnti" in plan, plan
    assert "LeftSemi" in plan, plan


def test_sql_having_filters_after_aggregate(spark):
    from sales_agent_graphdb_spark.queries.relational import sql_api_having

    df = sql_api_having(spark, SF_SMALL)
    plan = _plan(df)
    assert "HashAggregate" in plan
    rows = df.collect()
    assert rows, "HAVING query must be non-vacuous"
    assert all(r.n_items > 100 for r in rows)


def test_sql_cte_rank_broadcasts_part_dim(spark):
    from sales_agent_graphdb_spark.queries.relational import sql_api_cte_rank

    plan = _plan(sql_api_cte_rank(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan, plan


def test_sql_exists_in_nonvacuous(spark):
    from sales_agent_graphdb_spark.queries.relational import sql_api_exists_in

    assert sql_api_exists_in(spark, SF_SMALL).count() >= 1


def test_dedup_verdict_rows_all_true(spark):
    """The planted-pair verdict queries must emit exactly 60 rows with
    every verdict boolean TRUE (the all-TRUE oracle contract)."""
    from sales_agent_graphdb_spark.registry import all_queries

    specs = all_queries()
    for name in (
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_incremental_minhash",
        "dedup_cluster_canonical",
    ):
        rows = specs[name].fn(spark, SF_SMALL).collect()
        assert len(rows) == 60, name
        for r in rows:
            d = r.asDict()
            for k, v in d.items():
                if k not in ("id_a", "id_b", "new_id", "corpus_id", "is_exact"):
                    assert v is True, f"{name}: verdict {k}={v} on row {d}"


def test_kcore_fixpoint_converges_data_determined(spark):
    """The fixpoint loop must exit on the changed-flag well before the
    max-round guard, with a data-determined depth > 1 (a depth of 1
    would mean the whole graph is already a core — a vacuous loop) and
    a non-empty residual core."""
    from sales_agent_graphdb_spark.queries.graphq import (
        _KCORE_FIX_GUARD,
        _KCORE_FIX_K,
        graph_k_core_fixpoint,
    )

    rows = graph_k_core_fixpoint(spark, SF_SMALL).collect()
    assert rows, "fixpoint core must be non-empty"
    depth = rows[0].rounds_to_fixpoint
    assert 1 < depth < _KCORE_FIX_GUARD
    assert all(r.rounds_to_fixpoint == depth for r in rows)
    assert all(r.residual_degree >= _KCORE_FIX_K for r in rows)


def test_distributed_ntile_matches_builtin(spark):
    """distributed_ntile must equal Spark's own global ntile window on
    a frame whose size is NOT divisible by n (exercising the uneven
    size rule) and that contains heavy order-key ties (exercising the
    composite tie-break)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sales_agent_graphdb_spark.operators.prefix_sum import distributed_ntile

    n = 7
    # 157 rows, values with many ties (mod 13), unique id tie-break
    df = spark.range(157).select(
        (F.col("id") % 13).alias("v"), F.col("id").alias("uid")
    )
    got = {
        (r.v, r.uid): r.bucket
        for r in distributed_ntile(df, ["v", "uid"], n).collect()
    }
    w = Window.orderBy("v", "uid")
    want = {
        (r.v, r.uid): r.bucket
        for r in df.select("v", "uid", F.ntile(n).over(w).alias("bucket")).collect()
    }
    assert got == want


def test_distributed_ntile_rejects_reserved_columns(spark):
    import pytest
    from pyspark.sql import functions as F

    from sales_agent_graphdb_spark.operators.prefix_sum import distributed_ntile

    df = spark.range(5).select(F.col("id"), F.lit(1).alias("_rn"))
    with pytest.raises(ValueError):
        distributed_ntile(df, ["id"], 3)


def test_tpch_q3_plans_topk_with_pushed_filters(spark):
    """Q3 must plan the LIMIT as TakeOrderedAndProject (no global
    sort) and push the segment/date predicates into the scans."""
    from sales_agent_graphdb_spark.queries.tpch import tpch_q3_shipping_priority

    plan = _plan(tpch_q3_shipping_priority(spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan, plan
    assert "PushedFilters" in plan
    assert "BUILDING" in plan  # segment filter reached a scan


def test_tpch_q5_broadcasts_dims_and_keeps_locality_as_join_key(spark):
    """nation/region must broadcast; the customer-nation ==
    supplier-nation locality constraint must ride a join condition,
    never survive as a post-join Filter over the cross-nation volume."""
    from sales_agent_graphdb_spark.queries.tpch import (
        tpch_q5_local_supplier_volume,
    )

    df = tpch_q5_local_supplier_volume(spark, SF_SMALL)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    for line in plan.splitlines():
        if line.strip().startswith("+- Filter") or line.strip().startswith(": +- Filter"):
            assert "c_nationkey" not in line or "s_nationkey" not in line, line


def test_tpch_q6_pushes_every_predicate(spark):
    """Q6 is the pushdown probe: date range + discount band + quantity
    must all reach the parquet scan."""
    from sales_agent_graphdb_spark.queries.tpch import tpch_q6_forecast_revenue

    plan = _plan(tpch_q6_forecast_revenue(spark, SF_SMALL))
    assert "PushedFilters" in plan
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in plan.split("ReadSchema")[0] or col in plan, (col, plan)


def test_tpch_q10_topk_no_global_sort(spark):
    from sales_agent_graphdb_spark.queries.tpch import tpch_q10_returned_items

    plan = _plan(tpch_q10_returned_items(spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan, plan


def test_api_sink_abort_publishes_nothing(spark, tmp_path):
    """The two-phase commit contract: a job that fails mid-write must
    leave NO published batch files and NO _COMMITTED manifest — only
    commit() publishes. A reader that trusts the manifest therefore
    observes the write atomically or not at all."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from sales_agent_graphdb_spark.sources.api_source import register_api_sink

    register_api_sink(spark)
    tgt = str(tmp_path / "sink_abort")
    os.makedirs(tgt, exist_ok=True)
    # raise_error fires on one partition mid-write => job fails.
    df = spark.range(100).select(
        F.when(F.col("id") == 57, F.raise_error("boom"))
        .otherwise(F.col("id"))
        .alias("id")
    ).repartition(4)
    with pytest.raises(Exception):
        df.write.format("api_sink").mode("append").option("path", tgt).save()
    published = [f for f in os.listdir(tgt) if f.startswith("batch-")]
    assert published == []
    assert not os.path.exists(os.path.join(tgt, "_COMMITTED"))


def test_api_sink_commit_manifest_accounts_every_row(spark, tmp_path):
    import json
    import os

    from sales_agent_graphdb_spark.sources.api_source import register_api_sink

    register_api_sink(spark)
    tgt = str(tmp_path / "sink_ok")
    os.makedirs(tgt, exist_ok=True)
    spark.range(250).repartition(5).write.format("api_sink").mode(
        "append"
    ).option("path", tgt).save()
    manifest = json.load(open(os.path.join(tgt, "_COMMITTED")))
    assert sum(m["rows"] for m in manifest) == 250
    assert len(manifest) == 5
    assert not os.path.exists(os.path.join(tgt, "_staging"))
