#!/usr/bin/env python
"""Core-count scaling probe at the synthetic decade (VERDICT r12 #2).

The driver's own c8/c32 probe runs at sf0.1, where nearly every query
sits on a fixed planning/codegen/job-latency floor and the ratio reads
~1 (148/166 queries in PERF_r12). This tool measures the SAME
wall-clock ratio where the data is ~10x bigger (sfsynth1.0,
tools/gen_synth_decade.py), so compute actually dominates and the
low-core/high-core ratio is informative.

Run it twice (separate processes — the master is fixed per session):

    SPARK_GRAFT_CPUS=32 python tools/core_scaling.py > /tmp/core32.jsonl
    SPARK_GRAFT_CPUS=8  python tools/core_scaling.py > /tmp/core8.jsonl

then merge with --merge /tmp/core32.jsonl /tmp/core8.jsonl to print the
SCALE.md table rows. Perf-only data — correctness oracles never run
against the synthetic decade.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SYNTH = os.path.join(REPO, ".scratch", "sfsynth1.0")

# Shuffle-heavy, data-sized families (all proven to run on the synthetic
# decade by scaling_curve --decade2): dedup, text, tpch aggregate,
# window/percentile, iterative graph, sessionization, stats.
QUERIES = [
    "dedup_minhash_lsh",
    "dedup_containment",
    "dedup_minhash_estimate_accuracy",
    "text_lm_perplexity_filter",
    "text_bm25_search",
    "text_entropy_filter",
    "tpch_q1_pricing_summary",
    "pct_weighted_median",
    "graph_k_core_fixpoint",
    "sessionize_gap_batch",
    "stats_bootstrap_ci_hash",
    "ts_acf_hourly",
]


def measure() -> None:
    from sales_agent_graphdb_spark.registry import all_queries
    from sales_agent_graphdb_spark.session import get_spark

    spark = get_spark(app_name="core_scaling")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    specs = all_queries()
    # warm the JVM/codegen once (bench.py methodology)
    specs["tpch_q1_pricing_summary"].fn(spark, SYNTH).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in QUERIES:
        spark.sparkContext.setJobDescription(f"core_scaling[{cpus}]: {name}")
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            specs[name].fn(spark, SYNTH).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(round(time.perf_counter() - t0, 3))
        print(
            json.dumps({"name": name, "cpus": int(cpus), "walls": walls}),
            flush=True,
        )


def merge(path32: str, path8: str) -> None:
    def load(p):
        out = {}
        for line in open(p):
            d = json.loads(line)
            out[d["name"]] = min(d["walls"])  # best-of-2: steady state
        return out

    w32, w8 = load(path32), load(path8)
    print("| query | c32 best (s) | c8 best (s) | c8/c32 ratio |")
    print("|---|---|---|---|")
    for name in QUERIES:
        if name in w32 and name in w8:
            r = w8[name] / w32[name] if w32[name] else float("nan")
            print(f"| {name} | {w32[name]:.2f} | {w8[name]:.2f} | {r:.2f} |")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--merge":
        merge(sys.argv[2], sys.argv[3])
    else:
        measure()
