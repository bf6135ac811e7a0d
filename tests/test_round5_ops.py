"""Semantic invariants for the round-5 operators (passage dedup,
curriculum sampling, hard-negative mining, int8 quantization, OHLC
downsample, label propagation). Exact cross-engine value parity is
covered by test_oracle_parity; these pin the properties a hash match
alone would not explain.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sales_agent_graphdb_spark.queries.dedup import dedup_repeated_passages
from sales_agent_graphdb_spark.queries.curation import sample_quality_bins, _BIN_RATES
from sales_agent_graphdb_spark.queries.graphq import graph_label_propagation
from sales_agent_graphdb_spark.queries.temporal import ts_downsample_ohlc
from sales_agent_graphdb_spark.queries.vector import (
    _HN_K,
    ann_hard_negatives,
    vec_quantize_int8,
)
from tests.conftest import SF_MEDIUM, SF_SMALL


def test_repeated_passages_bounds_and_nonvacuous(spark):
    # sf0.01 carries real cross-doc repeats; the flag must fire there.
    rows = dedup_repeated_passages(spark, SF_MEDIUM).collect()
    assert rows, "no documents produced segments"
    assert all(0 <= r.n_boiler <= r.n_segments for r in rows)
    assert all(abs(r.pct_boiler - r.n_boiler / r.n_segments) < 1e-12 for r in rows)
    assert sum(1 for r in rows if r.n_boiler > 0) > 0, "vacuous: no repeats flagged"


def test_quality_bins_rates_monotone(spark):
    rows = sample_quality_bins(spark, SF_MEDIUM).collect()
    assert {r.bin for r in rows} <= {0, 1, 2, 3}
    # top bin keeps everything (rate 1.0)
    top = [r for r in rows if r.bin == 3]
    assert top and all(r.kept for r in top)
    # realized keep-rate per bin must not exceed ~rate + slack, and the
    # configured rates are monotone by construction
    assert list(_BIN_RATES) == sorted(_BIN_RATES)
    for b in range(4):
        in_bin = [r for r in rows if r.bin == b]
        if len(in_bin) >= 20:
            realized = sum(r.kept for r in in_bin) / len(in_bin)
            assert realized <= _BIN_RATES[b] + 0.15


def test_hard_negatives_never_same_label(spark):
    rows = ann_hard_negatives(spark, SF_SMALL).collect()
    assert rows
    assert all(r.neg_label != r.q_label for r in rows)
    assert all(1 <= r.rk <= _HN_K for r in rows)
    assert all(-1.0 - 1e-9 <= r.sim <= 1.0 + 1e-9 for r in rows)
    # ranks are descending in similarity within each query
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    for grp in by_q.values():
        grp.sort(key=lambda r: r.rk)
        sims = [r.sim for r in grp]
        assert sims == sorted(sims, reverse=True)


def test_quantize_error_bounded_by_half_step(spark):
    rows = vec_quantize_int8(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.scale > 0
        # half-up rounding to a grid of width `scale` can never be off
        # by more than half a step (clipping cannot bind: |x| <= 127*scale)
        assert r.max_abs_err <= r.scale / 2 + 1e-12
        assert 0 <= r.mse <= (r.scale / 2) ** 2 + 1e-12


def test_ohlc_bar_invariants(spark):
    rows = ts_downsample_ohlc(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.low <= r.high
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        assert r.n_events >= 1


def test_lpa_deterministic_and_propagating(spark):
    a = graph_label_propagation(spark, SF_SMALL).collect()
    b = graph_label_propagation(spark, SF_SMALL).collect()
    assert a == b, "LPA must be a pure function of the graph"
    nodes = {r.node for r in a}
    assert all(r.community in nodes for r in a)
    # propagation happened: at least one node no longer carries its own id
    assert any(r.community != r.node for r in a)


def test_ohlc_single_shuffle_plan(spark):
    # Both windows and the aggregation share one partitioning: exactly
    # one Exchange in the physical plan (plus the AQE reads of it).
    df = ts_downsample_ohlc(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange <= 2, f"expected one data shuffle (+top-level sort), got:\n{plan}"


def test_ewma_matches_python_recurrence(spark):
    import math

    from sales_agent_graphdb_spark.queries.temporal import (
        _EWMA_ALPHA,
        ts_ewma_per_user,
    )

    rows = ts_ewma_per_user(spark, SF_SMALL).collect()
    assert rows
    # recompute one user's EWMA from the raw events in Python
    import duckdb

    con = duckdb.connect()
    uid = rows[0].user_id
    evs = con.execute(
        f"SELECT value FROM read_parquet('{SF_SMALL}/events.parquet') "
        f"WHERE user_id = {uid} ORDER BY ts, event_id"
    ).fetchall()
    y = evs[0][0]
    for (x,) in evs[1:]:
        y = x * _EWMA_ALPHA + y * (1 - _EWMA_ALPHA)
    assert math.isclose(rows[0].ewma, y, rel_tol=0, abs_tol=0), (rows[0].ewma, y)


def test_sql_api_plan_broadcasts_both_dims(spark):
    from sales_agent_graphdb_spark.queries.relational import sql_api_revenue_by_nation

    df = sql_api_revenue_by_nation(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan


def test_compaction_collapses_files(spark):
    import glob

    from sales_agent_graphdb_spark.queries.sources_io import (
        _FRAG_FILES,
        _scratch,
        s13_compact_small_files,
    )

    s13_compact_small_files(spark, SF_SMALL).collect()
    frag = _scratch(SF_SMALL, "events_fragmented")
    compact = _scratch(SF_SMALL, "events_compacted")
    frag_days = glob.glob(f"{frag}/day=*")
    compact_days = glob.glob(f"{compact}/day=*")
    assert frag_days and len(frag_days) == len(compact_days)
    n_frag = sum(len(glob.glob(f"{d}/*.parquet")) for d in frag_days)
    n_compact = sum(len(glob.glob(f"{d}/*.parquet")) for d in compact_days)
    assert n_compact == len(compact_days), "expected exactly one file per day"
    assert n_frag > n_compact, (n_frag, n_compact)


def test_quantize_no_shuffle_no_python(spark):
    df = vec_quantize_int8(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange hashpartitioning" not in plan  # map-side only (+sort for output order)


def test_metrics_probe_dedupes_reused_exchange(spark):
    """A self-joined aggregate reuses one exchange; the probe must
    count its shuffle metrics once (review finding: ReusedExchangeExec
    descent double-counted before the node-id dedupe)."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "metrics_probe",
        pathlib.Path(__file__).resolve().parents[1] / "tools" / "metrics_probe.py",
    )
    mp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mp)

    from sales_agent_graphdb_spark import catalog

    ev = catalog.load_table(spark, SF_SMALL, "events")
    agg = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    joined = agg.alias("a").join(
        agg.alias("b"), F.col("a.event_type") == F.col("b.event_type")
    )
    m = mp.collect_metrics(joined)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    if "ReusedExchange" in plan:
        # one physical exchange, counted once: 5 event types shuffled
        # as partial-agg rows, NOT doubled by the reuse pointer
        assert m["n_exchanges"] == 1, m
        n_types = 5
        assert m["shuffle_records_written"] <= n_types * 32, m
