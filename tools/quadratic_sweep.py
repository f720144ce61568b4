"""One-off full-brute-force validation: run the 8 quadratic-oracle
queries against their DuckDB mirrors at sf0.1 with NO sampling — the
multi-minute brute-force joins the regular sweep skips (each already
covered by an sf0.1-verified sampled twin; this script removes even
that caveat when given the wall-clock budget).

Usage: python tools/quadratic_sweep.py  [SPARK_GRAFT_SIM_SF=...]
"""
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
import duckdb

import __spark_entry__ as e
from bigdatamanagement_spark.catalog import TESTDATA_TABLES
from bigdatamanagement_spark.session import get_spark

NAMES = [
    "ext_minhash_lsh_pairs",
    "ext_ngram_containment_pairs",
    "ext_multi_signal_dedup",
    "ext_curation_funnel",
    "ext_training_set_manifest",
    "ext_dedup_clusters",
    "ext_dedup_cluster_survivors",
    "ext_trigram_similarity_bands",
    "ext_leakage_safe_split",
]

SF = os.environ.get("SPARK_GRAFT_SIM_SF", "/root/testdata/sf0.1")
spark = get_spark(app_name="quadratic-sweep", shuffle_partitions=8)
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
for name in NAMES:
    t0 = time.time()
    srows = qs[name](spark, SF).toArrow().to_pylist()
    t1 = time.time()
    drows = con.execute(oracles[name]).arrow().to_pylist()
    t2 = time.time()
    scols = sorted(srows[0].keys()) if srows else []
    dcols = sorted(drows[0].keys()) if drows else []
    s = sorted(tuple(norm(r[c]) for c in scols) for r in srows)
    d = sorted(tuple(norm(r[c]) for c in dcols) for r in drows)
    match = scols == dcols and s == d
    ok &= match
    print(
        f"{name}: spark={len(s)} ({t1 - t0:.0f}s) oracle={len(d)}"
        f" ({t2 - t1:.0f}s) match={match}",
        flush=True,
    )
print("ALL MATCH" if ok else "MISMATCH", flush=True)
