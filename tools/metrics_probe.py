#!/usr/bin/env python
"""Runtime shuffle/spill metrics for representative headline queries.

Plan audits (tools/plan_audit.py) prove the plan SHAPE is right; this
probe proves the RUNTIME cost is right: after executing each query it
walks the final (post-AQE) physical plan and sums the SQLMetrics that
matter at 100 TB — shuffle bytes/records written and spill sizes — so
a shuffle that silently carries the whole corpus shows up as a number,
not a guess.

Usage: python tools/metrics_probe.py [sf_dir]
Prints one JSON line per query + a summary line; also appended
per-round to SCALE.md by hand when the numbers move.

Caveats: queries that localCheckpoint intermediate frames (the
iterative graph algorithms, the twice-consumed dedup frames) truncate
lineage, so only the post-checkpoint stages are counted — their
numbers are a floor, not a total. Final ORDER BY adds one range
Exchange to n_exchanges; that sort exists only for deterministic
driver output and would be dropped in production writes.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sales_agent_graphdb_spark.registry import all_queries  # noqa: E402
from sales_agent_graphdb_spark.session import get_spark  # noqa: E402

# Queries whose shuffle economics represent each operator family.
PROBED = [
    "flagship_revenue_by_brand",   # broadcast dim + one agg shuffle
    "sql_api_revenue_by_nation",   # 4-way join from SQL text
    "j2_order_nest_strform",       # join + collect_list group
    "dedup_minhash_lsh",           # band shuffle (skinny by design)
    "dedup_repeated_passages",     # md5-keyed segment shuffle
    "text_bm25_search",            # inverted-index posting shuffle
    "graph_connected_components",  # iterative pointer doubling
    "graph_label_propagation",     # per-round O(|E|) join
    "ts_downsample_ohlc",          # single-exchange window+agg
    "ann_hard_negatives",          # broadcast hash join, no shuffle
    "vec_quantize_int8",           # map-side only — zero shuffle
    "m8_cdc_apply",                # latest-op window + keyed merge
    "graph_k_core",                # per-round degree agg (post-checkpoint floor)
    "corpus_shuffle_epoch",        # sharded permutation, no global sort
    "asof_join_nearest",           # one user-sharded two-direction window
]

# SQLMetric map keys worth aggregating (camelCase internal names).
KEYS = {
    "shuffleBytesWritten": "shuffle_bytes_written",
    "shuffleRecordsWritten": "shuffle_records_written",
    "spillSize": "spill_bytes",
}


def _iter_nodes(node, seen=None):
    # Dedupe on the SparkPlan node id: AQE plans are DAGs (a
    # ReusedExchangeExec points at a ShuffleExchangeExec that is also
    # reachable through its own query stage), and yielding the same
    # physical node twice double-counts its SQLMetrics.
    if seen is None:
        seen = set()
    node_id = int(node.id())
    if node_id in seen:
        return
    seen.add(node_id)
    yield node
    kids = node.children()
    for i in range(kids.size()):
        yield from _iter_nodes(kids.apply(i), seen)
    # AQE wraps each materialized stage (Shuffle/Broadcast/Result
    # QueryStageExec) behind .plan(), and the adaptive root behind
    # .executedPlan() — children() alone sees none of them.
    name = node.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec":
        yield from _iter_nodes(node.executedPlan(), seen)
    elif name.endswith("QueryStageExec"):
        yield from _iter_nodes(node.plan(), seen)
    elif name == "ReusedExchangeExec":
        yield from _iter_nodes(node.child(), seen)


def collect_metrics(df) -> dict[str, int]:
    df.collect()  # materialize so SQLMetrics carry real values
    plan = df._jdf.queryExecution().executedPlan()
    agg: dict[str, int] = {
        "shuffle_bytes_written": 0,
        "shuffle_records_written": 0,
        "spill_bytes": 0,
        "n_exchanges": 0,
    }
    for node in _iter_nodes(plan):
        cls = node.getClass().getSimpleName()
        if "ShuffleExchange" in cls:
            agg["n_exchanges"] += 1
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            key, metric = kv._1(), kv._2()
            if key in KEYS:
                agg[KEYS[key]] += max(0, int(metric.value()))
    return agg


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(app_name="metrics_probe")
    qs = all_queries()
    out = {}
    for name in PROBED:
        spec = qs.get(name)
        if spec is None:
            continue
        m = collect_metrics(spec.fn(spark, sf_dir))
        out[name] = m
        print(json.dumps({"query": name, "sf_dir": sf_dir, **m}))
    total = sum(m["shuffle_bytes_written"] for m in out.values())
    spills = sum(m["spill_bytes"] for m in out.values())
    print(json.dumps({
        "summary": "metrics_probe",
        "sf_dir": sf_dir,
        "queries": len(out),
        "total_shuffle_bytes": total,
        "total_spill_bytes": spills,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
