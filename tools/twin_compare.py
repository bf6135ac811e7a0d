#!/usr/bin/env python
"""One-off probe (round 6): for each rows-only perf twin, compare its
collected output against its hash-green portable counterpart (and,
for the ANN paths, against the exact brute-force top-k). Determines
which twins can take the portable oracle SQL directly (bit-equal ->
zero plan change) and which need an in-plan verdict form.
"""
from __future__ import annotations

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sales_agent_graphdb_spark.registry import all_queries
from sales_agent_graphdb_spark.session import get_spark


def rows_of(df):
    cols = df.columns
    return cols, sorted(tuple(r) for r in df.collect())


def compare(spark, sf_dir, perf, portable, specs):
    pc, pr = rows_of(specs[perf].fn(spark, sf_dir))
    qc, qr = rows_of(specs[portable].fn(spark, sf_dir))
    same_cols = pc == qc
    same_rows = pr == qr
    print(f"{perf} vs {portable} @ {sf_dir}:")
    print(f"  cols perf={pc} portable={qc} same={same_cols}")
    print(f"  rows perf={len(pr)} portable={len(qr)} equal={same_rows}")
    if not same_rows:
        sp = set(pr) - set(qr)
        sq = set(qr) - set(pr)
        print(f"  only-perf ({len(sp)}): {sorted(sp)[:6]}")
        print(f"  only-portable ({len(sq)}): {sorted(sq)[:6]}")
    return same_cols and same_rows


def main():
    spark = get_spark(app_name="twin_compare")
    specs = all_queries()
    pairs = [
        ("ann_lsh_topk", "ann_lsh_topk_portable"),
        ("ann_ivf_topk", "ann_ivf_topk_portable"),
        ("ann_lsh_pruned_topk", "ann_lsh_pruned_portable"),
        ("ann_ivf_pruned_topk", "ann_ivf_pruned_portable"),
        ("dedup_minhash_lsh", "dedup_minhash_lsh_portable"),
        ("dedup_simhash", "dedup_simhash_portable"),
        ("dedup_incremental_minhash", "dedup_incremental_minhash_portable"),
        ("dedup_cluster_canonical", "dedup_cluster_canonical_portable"),
    ]
    for sf_dir in sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]:
        for perf, portable in pairs:
            try:
                compare(spark, sf_dir, perf, portable, specs)
            except Exception as e:  # noqa: BLE001
                print(f"{perf}: ERROR {type(e).__name__}: {e}")
        print("---")


if __name__ == "__main__":
    main()
