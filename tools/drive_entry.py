"""Driver simulation: what the spark-graft driver does to __spark_entry__."""
import sys, json, hashlib
sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as E

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# 1. smoke: entry() at sf0.001
df = E.entry(spark)
rows = df.collect()
print("SMOKE entry rows:", len(rows), "schema:", [f.name for f in df.schema.fields])
print("  first row:", rows[0])

# 2. correctness: queries vs oracle at sf0.01 (driver protocol)
SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

qs, os_ = E.queries(), E.oracle_sql()
print(f"queries={len(qs)} oracles={len(os_)}")
def vhash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(tuple(repr(r[i]) for i in order) for r in rows)
    return hashlib.md5(str(canon).encode()).hexdigest()[:12]

fails = []
for name, fn in sorted(qs.items()):
    sdf = fn(spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    if name not in os_:
        print(f"  {name}: rows-only {len(srows)} rows")
        continue
    res = con.execute(os_[name])
    ocols = [d[0] for d in res.description]
    orows = [tuple(r) for r in res.fetchall()]
    ok_n = len(srows) == len(orows)
    ok_c = sorted(sdf.columns) == sorted(ocols)
    ok_v = vhash(srows, sdf.columns) == vhash(orows, ocols)
    status = "OK" if (ok_n and ok_c and ok_v) else "MISMATCH"
    if status != "OK":
        fails.append(name)
    print(f"  {name}: {status} rows={len(srows)}/{len(orows)} cols_ok={ok_c} hash_ok={ok_v}")
print("FAILURES:", fails if fails else "none")
