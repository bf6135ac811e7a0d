"""Targeted driver-protocol check: run NAMED queries vs their DuckDB
oracles with the exact comparison drive_entry.py uses (shared via
tools/driver_protocol.py). For fast iteration on individual queries
without the full registry sweep.

Run: python tools/check_queries.py name1 name2 ...  [--sf /root/testdata/sf0.01]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from driver_protocol import make_duck, make_spark, vhash  # noqa: E402

from sales_agent_graphdb_spark.registry import all_queries  # noqa: E402


def print_stamp_map() -> None:
    """Regenerate the registry's _VERIFIED_ROUND dict body from the
    CORRECTNESS_r*.json records: each name maps to the LATEST round
    with a fully-green driver row (rows+schema green, hash green or
    absent, no err). Paste the output into registry.py after each
    round to fold the new greens in."""
    import glob
    import json
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    stamp: dict[str, int] = {}
    latest_red: dict[str, int] = {}  # name -> latest NON-green round
    for p in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")),
                    key=lambda p: int(re.search(r"_r(\d+)", p).group(1))):
        rnd = int(re.search(r"_r(\d+)", p).group(1))
        for name, row in json.load(open(p)).items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") in (True, None)
                and not row.get("err")
            ):
                stamp[name] = rnd
                latest_red.pop(name, None)
            else:
                latest_red[name] = rnd
    # A name whose MOST RECENT driver record is red/errored must not
    # carry a "verified" stamp — it would be deprioritized by the
    # driver schedule while actually regressed (ADVICE r07 #1).
    for name, rnd in sorted(latest_red.items()):
        if name in stamp:
            print(f"    # DROPPED {name}: green r{stamp.pop(name):02d} but "
                  f"latest record r{rnd:02d} is red/errored — re-verify first")
    for rnd in sorted(set(stamp.values())):
        names = sorted(n for n, v in stamp.items() if v == rnd)
        print(f"    # --- latest green row: CORRECTNESS_r{rnd:02d} ({len(names)} names) ---")
        line = "   "
        for n in names:
            tok = f' "{n}": {rnd},'
            if len(line) + len(tok) > 78:
                print(line)
                line = "   "
            line += tok
        print(line)


def main() -> None:
    args = sys.argv[1:]
    if args == ["--stamp"]:
        print_stamp_map()
        return
    sf = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        if i + 1 >= len(args):
            sys.exit("usage: check_queries.py name... [--sf DIR] (--sf needs a value)")
        sf = args[i + 1]
        args = args[:i] + args[i + 2:]
    if not args:
        sys.exit("usage: check_queries.py name... [--sf DIR] (no query names given)")

    specs = all_queries()
    unknown = [n for n in args if n not in specs]
    if unknown:
        sys.exit(f"unknown query names (before Spark startup): {unknown}")

    spark = make_spark("check_queries")
    con = make_duck(sf)

    fails = []
    for name in args:
        spec = specs[name]
        sdf = spec.fn(spark, sf)
        srows = [tuple(r) for r in sdf.collect()]
        if spec.oracle is None:
            print(f"  {name}: rows-only {len(srows)} rows")
            continue
        res = con.execute(spec.oracle)
        ocols = [d[0] for d in res.description]
        orows = [tuple(r) for r in res.fetchall()]
        ok_n = len(srows) == len(orows)
        ok_c = sorted(sdf.columns) == sorted(ocols)
        ok_v = vhash(srows, sdf.columns) == vhash(orows, ocols)
        ok = ok_n and ok_c and ok_v
        if not ok:
            fails.append(name)
        print(
            f"  {name}: {'OK' if ok else 'MISMATCH'} rows={len(srows)}/{len(orows)}"
            f" cols_ok={ok_c} hash_ok={ok_v}"
        )
        if not ok and srows and orows:
            print(f"    spark[:2]={srows[:2]}")
            print(f"    oracle[:2]={orows[:2]}")
    print("FAILURES:", fails if fails else "none")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
