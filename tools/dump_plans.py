#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to plans/rNN/<name>_<suffix>.txt.

Usage: python tools/dump_plans.py SUFFIX name1 name2 ... [--sf DIR] [--outdir plans/r12]
       [--exec]   # collect() first so the dump shows the FINAL AQE plan
                  # (isFinalPlan=true, runtime join strategies) instead of
                  # the initial estimate-based plan
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sales_agent_graphdb_spark.registry import all_queries  # noqa: E402
from sales_agent_graphdb_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = sys.argv[1:]
    suffix = args.pop(0)
    sf_dir = "/root/testdata/sf0.1"
    outdir = os.path.join(REPO, "plans", "r12")
    names = []
    run_first = False
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--outdir":
            outdir = args[i + 1]
            i += 2
        elif args[i] == "--exec":
            run_first = True
            i += 1
        else:
            names.append(args[i])
            i += 1
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    specs = all_queries()
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        if run_first:
            df.collect()
        txt = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
