"""Simulate the driver: entry() smoke + queries() vs oracle_sql().

SF dir overridable: SPARK_GRAFT_SIM_SF=/root/testdata/sf0.1 python tools/driver_sim.py"""
import os
import sys, os
sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
import duckdb
import __spark_entry__ as e
from bigdatamanagement_spark.session import get_spark
from bigdatamanagement_spark.catalog import TESTDATA_TABLES

SF = os.environ.get("SPARK_GRAFT_SIM_SF", "/root/testdata/sf0.01")
spark = get_spark(app_name="driver-sim", shuffle_partitions=8)

# smoke: entry
df = e.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={df.columns}")
assert len(rows) >= 0

con = duckdb.connect()
for t in TESTDATA_TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

import math
def norm(v):
    if v is None: return "<NULL>"
    if isinstance(v, float):
        return "<NULL>" if math.isnan(v) else f"{v:.6g}"
    if hasattr(v, "isoformat"): return v.isoformat()
    if isinstance(v, (list, tuple)): return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

qs, oracles = e.queries(), e.oracle_sql()
# SPARK_GRAFT_SIM_SKIP: comma-separated query names whose ORACLES are
# deliberate O(n^2) brute-force mirrors — impractical in DuckDB at
# sf0.1 corpus sizes (each is verified at sf0.001 + sf0.01 where the
# brute force is feasible). Used for large-SF validation sweeps.
skip = {
    s for s in os.environ.get("SPARK_GRAFT_SIM_SKIP", "").split(",") if s
}
# SPARK_GRAFT_SIM_ONLY: comma-separated names — run just these (fast
# targeted re-check after touching a pack; full sweep stays the gate).
only = {
    s for s in os.environ.get("SPARK_GRAFT_SIM_ONLY", "").split(",") if s
}
if only:
    qs = {k: v for k, v in qs.items() if k in only}
ok = True
for name, fn in qs.items():
    if name in skip:
        print(f"{name}: SKIPPED (quadratic oracle; verified at small SF)")
        continue
    sdf = fn(spark, SF)
    srows = sdf.toArrow().to_pylist()
    if name not in oracles:
        print(f"{name}: rows-only check, {len(srows)} rows")
        continue
    drows = con.execute(oracles[name]).arrow().to_pylist()
    scols = sorted(srows[0].keys()) if srows else []
    dcols = sorted(drows[0].keys()) if drows else []
    s = sorted(tuple(norm(r[c]) for c in scols) for r in srows)
    d = sorted(tuple(norm(r[c]) for c in dcols) for r in drows)
    match = scols == dcols and s == d
    ok &= match
    print(f"{name}: spark={len(s)} oracle={len(d)} cols_match={scols==dcols} values_match={s==d}")
print("ALL MATCH" if ok else "MISMATCH")
