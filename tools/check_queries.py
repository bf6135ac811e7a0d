"""Targeted driver-protocol check: run NAMED queries vs their DuckDB
oracles with the exact comparison drive_entry.py uses. For fast
iteration on individual queries without the full 134-query sweep.

Run: python tools/check_queries.py name1 name2 ...  [--sf /root/testdata/sf0.01]
"""
import hashlib
import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

from sales_agent_graphdb_spark.registry import all_queries

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def vhash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(tuple(repr(r[i]) for i in order) for r in rows)
    return hashlib.md5(str(canon).encode()).hexdigest()[:12]


def main() -> None:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        args = args[:i] + args[i + 2:]

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    specs = all_queries()
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
