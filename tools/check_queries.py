"""Check a subset of queries() vs oracle_sql() (fast iteration loop).

Usage: python tools/check_queries.py name1 name2 ...  [SPARK_GRAFT_SIM_SF=...]
"""
import math
import os
import sys

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
import duckdb

import __spark_entry__ as e
from bigdatamanagement_spark.catalog import TESTDATA_TABLES
from bigdatamanagement_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SIM_SF", "/root/testdata/sf0.01")
names = sys.argv[1:]
spark = get_spark(app_name="check-queries", shuffle_partitions=8)

con = duckdb.connect()
for t in TESTDATA_TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")


def norm(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        return "<NULL>" if math.isnan(v) else f"{v:.6g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


qs, oracles = e.queries(), e.oracle_sql()
ok = True
for name in names:
    fn = qs[name]
    sdf = fn(spark, SF)
    srows = sdf.toArrow().to_pylist()
    if name not in oracles:
        print(f"{name}: rows-only, {len(srows)} rows; head={srows[:3]}")
        continue
    drows = con.execute(oracles[name]).arrow().to_pylist()
    scols = sorted(srows[0].keys()) if srows else []
    dcols = sorted(drows[0].keys()) if drows else []
    s = sorted(tuple(norm(r[c]) for c in scols) for r in srows)
    d = sorted(tuple(norm(r[c]) for c in dcols) for r in drows)
    match = scols == dcols and s == d
    ok &= match
    print(f"{name}: spark={len(s)} oracle={len(d)} cols={scols==dcols} vals={s==d}")
    if not match:
        print(f"  spark cols={scols}\n  duck  cols={dcols}")
        diff_s = [r for r in s if r not in d][:3]
        diff_d = [r for r in d if r not in s][:3]
        print(f"  spark-only: {diff_s}\n  duck-only:  {diff_d}")
print("ALL MATCH" if ok else "MISMATCH")
sys.exit(0 if ok else 1)
