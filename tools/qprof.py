"""Per-query profiler: isolated timing + formatted plan + stage volumes.

Usage:
    python tools/qprof.py [--plans DIR --suffix before] [--reps 3] name1 name2 ...

For each named queries() entry: builds every memo substrate first (so
first-touch cost is not billed to the query), captures
``.explain('formatted')``, then times ``reps`` noop-sink materializations
and reads per-run shuffle read/write/spill from the status store —
the guide §1 loop (noop sink, labelled jobs, plan + volumes) in one
command. With ``--plans`` the formatted plan is written to
``<plans>/<name>_<suffix>.txt``.

SF dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1); cores
from $SPARK_GRAFT_CPUS like the bench.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plans", default=None, help="dir for plan files")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-memos", action="store_true")
    args = ap.parse_args()

    os.chdir(_REPO_ROOT)
    import __spark_entry__ as e
    from bench import _stage_metrics_reader
    from bigdatamanagement_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="qprof")
    qs = e.queries()
    unknown = [n for n in args.names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    # Same warm-up as bench.py: JVM codegen + Python worker pool.
    region = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    region.count()
    region.groupBy("r_regionkey").applyInPandas(
        lambda pdf: pdf, schema=region.schema
    ).write.mode("overwrite").format("noop").save()

    if not args.no_memos:
        from bigdatamanagement_spark.memos import build_all

        t0 = time.perf_counter()
        build_all(spark, sf_dir)
        print(f"memo_build_all: {time.perf_counter() - t0:.2f}s")

    read_stages = _stage_metrics_reader(spark)
    last_stage, _ = read_stages(-1)
    mb = 1.0 / (1024 * 1024)

    for name in args.names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            path = os.path.join(args.plans, f"{name}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"{name}: plan -> {path}")
        n_exchange = plan.count("Exchange")
        joins = [
            j
            for j in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastNestedLoopJoin",
                "CartesianProduct",
            )
            if j in plan
        ]
        pyn = [
            p
            for p in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow", "MapInPandas", "FlatMapGroupsInPandas")
            if p in plan
        ]
        print(f"{name}: Exchange×{n_exchange} joins={joins} python={pyn}")
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"qprof:{name}#{rep}")
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            last_stage, vols = read_stages(last_stage)
            if vols is None:
                print(f"  run{rep}: {dt:.3f}s (metrics unavailable)")
            else:
                rd, wr, sp = vols
                print(
                    f"  run{rep}: {dt:.3f}s shuffle_read={rd * mb:.2f}MB"
                    f" write={wr * mb:.2f}MB spill={sp * mb:.2f}MB"
                )
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
