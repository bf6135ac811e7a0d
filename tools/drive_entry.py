"""Driver simulation: what the spark-graft driver does to __spark_entry__."""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
from driver_protocol import make_duck, make_spark, vhash

import __spark_entry__ as E

spark = make_spark("drive_entry")

# 1. smoke: entry() at sf0.001
df = E.entry(spark)
rows = df.collect()
print("SMOKE entry rows:", len(rows), "schema:", [f.name for f in df.schema.fields])
print("  first row:", rows[0])

# 2. correctness: queries vs oracle at sf0.01 (driver protocol)
SF = "/root/testdata/sf0.01"
con = make_duck(SF)

qs, os_ = E.queries(), E.oracle_sql()
print(f"queries={len(qs)} oracles={len(os_)}")
fails = []
# Insertion order == the REAL driver's order (registry._driver_order);
# the first 50 printed here are exactly the driver's 50-slot budget.
for name, fn in qs.items():
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
