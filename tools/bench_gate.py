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

DRIFT PROTOCOL (VERDICT r09 #6): a loaded box inflates wall times
1.3-2x UNIFORMLY on unchanged code with unstable flag membership —
measured repeatedly across r08-r10. So a first-run flag is only a
suspicion: when the first run flags anything (and the gate ran bench
itself rather than reading a saved line), it reruns bench and reports
only queries flagged in BOTH runs (at their best observed timing) as
`regressed`; single-run flags are listed separately as
`drift_suspected` and do not fail the gate.
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
    # Prefer the full-map sidecar bench.py writes alongside each run
    # (VERDICT r11 #4): the driver envelope truncates its tail, losing
    # the head of the per-query dict; BENCH_LOCAL_r{N}.json carries
    # the complete map for the same round's code state.
    rnd = int(re.search(r"BENCH_r(\d+)", path).group(1))
    local = os.path.join(REPO, f"BENCH_LOCAL_r{rnd:02d}.json")
    if os.path.exists(local):
        doc = json.load(open(local))
        if "queries" in doc:
            print(f"note: using full-map sidecar {os.path.basename(local)} "
                  f"({len(doc['queries'])} queries) as the r{rnd} baseline")
            return local, doc
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


def _flags(pq: dict, cq: dict) -> set[str]:
    return {
        q for q in set(pq) & set(cq)
        if cq[q] > pq[q] * THRESHOLD and cq[q] > MIN_SEC
    }


def main() -> int:
    base_path, prev = _latest_baseline()
    pq = prev["queries"]
    cur = _current(sys.argv[1:])
    cq = dict(cur["queries"])
    flags1 = _flags(pq, cq)
    runs = 1
    drift_suspected: set[str] = set()
    if flags1 and not sys.argv[1:]:
        # confirming warm rerun: only queries slow in BOTH runs are
        # believed; take each query's best observed timing.
        print(f"first run flagged {len(flags1)} — rerunning to separate "
              "regression from box drift", file=sys.stderr)
        cq2 = _current([])["queries"]
        flags2 = _flags(pq, cq2)
        confirmed = flags1 & flags2
        drift_suspected = flags1 ^ flags2
        cq = {q: min(cq[q], cq2.get(q, cq[q])) for q in cq}
        # best-timing can clear a both-runs flag too (ratio from min) —
        # but a flag raised in BOTH runs must never vanish silently:
        # demote it to drift_suspected so borderline two-run regressions
        # stay visible in the gate output (ADVICE r10).
        cleared = confirmed - _flags(pq, cq)
        confirmed -= cleared
        drift_suspected |= cleared
        runs = 2
    else:
        confirmed = flags1
    common = sorted(set(pq) & set(cq))
    prev_total = sum(pq[q] for q in common)
    cur_total = sum(cq[q] for q in common)
    regressed = [(q, pq[q], cq[q]) for q in sorted(confirmed)]
    print(json.dumps({
        "baseline": os.path.basename(base_path),
        "common": len(common),
        "runs": runs,
        "prev_total_sec": round(prev_total, 2),
        "cur_total_sec": round(cur_total, 2),
        "new_queries": sorted(set(cq) - set(pq)),
        "drift_suspected": sorted(drift_suspected),
        "regressed": [
            {"query": q, "prev": round(a, 2), "cur": round(b, 2),
             "ratio": round(b / a, 2)}
            for q, a, b in sorted(regressed, key=lambda t: -t[2] / t[1])
        ],
    }))
    return 1 if regressed else 0


if __name__ == "__main__":
    raise SystemExit(main())
