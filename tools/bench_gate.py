#!/usr/bin/env python
"""Bench regression gate: run bench.py (or take a saved JSON line) and
compare per-query wall times against the previous round's BENCH_r{N}.json.

Usage:
  python tools/bench_gate.py                 # runs bench.py now vs latest BENCH_r*.json
  python tools/bench_gate.py current.json    # compare a saved bench line instead

Exit 1 if any common query regressed past THRESHOLD (warm-noise floor
MIN_SEC filters sub-second jitter). The driver records the official
BENCH_r{N}.json per round; this gate is the local pre-commit check so a
regression is caught in-session, not one round later in the verdict.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

THRESHOLD = 1.30  # ratio past which a query counts as regressed
MIN_SEC = 0.5     # ignore sub-noise-floor timings

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_baseline() -> tuple[str, dict]:
    # Sort by the parsed round number, not lexicographically — r100
    # would otherwise sort before r99, and an unpadded name would break.
    paths = sorted(
        glob.glob(os.path.join(REPO, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"BENCH_r(\d+)", p).group(1)),
    )
    if not paths:
        sys.exit("no BENCH_r*.json baseline found")
    path = paths[-1]
    doc = json.load(open(path))
    # Driver files wrap the bench line inside a capture envelope; accept
    # either the raw line or the envelope's tail.
    if "queries" in doc:
        return path, doc
    tail = doc.get("tail", "")
    m = re.search(r'\{"metric".*\}', tail)
    if m:
        return path, json.loads(m.group(0))
    # Driver envelopes truncate to the LAST ~2000 chars, cutting the
    # bench line's head off — recover the partial per-query dict (the
    # "recoverable common subset"): every `"name": float` pair in the
    # tail except the envelope's own scalar keys.
    skip = {"metric", "value", "unit", "sf", "n", "rc", "cpus"}
    queries = {
        k: float(v)
        for k, v in re.findall(r'"([A-Za-z0-9_]+)":\s*([0-9]+\.[0-9]+)', tail)
        if k not in skip
    }
    if not queries:
        sys.exit(f"{path}: no bench line found in envelope")
    print(f"note: {os.path.basename(path)} tail truncated — comparing "
          f"against its recoverable {len(queries)}-query subset")
    return path, {"queries": queries}


def _current(argv: list[str]) -> dict:
    if argv:
        return json.load(open(argv[0]))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip().splitlines()[-1]
    return json.loads(out)


def main() -> int:
    base_path, prev = _latest_baseline()
    cur = _current(sys.argv[1:])
    pq, cq = prev["queries"], cur["queries"]
    common = sorted(set(pq) & set(cq))
    prev_total = sum(pq[q] for q in common)
    cur_total = sum(cq[q] for q in common)
    regressed = [
        (q, pq[q], cq[q])
        for q in common
        if cq[q] > pq[q] * THRESHOLD and cq[q] > MIN_SEC
    ]
    print(json.dumps({
        "baseline": os.path.basename(base_path),
        "common": len(common),
        "prev_total_sec": round(prev_total, 2),
        "cur_total_sec": round(cur_total, 2),
        "new_queries": sorted(set(cq) - set(pq)),
        "regressed": [
            {"query": q, "prev": round(a, 2), "cur": round(b, 2),
             "ratio": round(b / a, 2)}
            for q, a, b in sorted(regressed, key=lambda t: -t[2] / t[1])
        ],
    }))
    return 1 if regressed else 0


if __name__ == "__main__":
    raise SystemExit(main())
