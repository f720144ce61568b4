"""Benchmark harness: runs every queries() entry at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

Execution is forced with a noop-format write (distributed materialization,
no driver collect), so timings measure the Spark plan, not result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from bigdatamanagement_spark.session import get_spark

    spark = get_spark(app_name="bdm-bench")
    qs = entrymod.queries()

    # Warm-up (untimed): JVM/codegen via one tiny scan, and the Python
    # worker pool + Arrow serializer via one trivial applyInPandas — the
    # first Pandas-UDF stage in a session otherwise pays ~5-8 s of
    # interpreter/Arrow startup that would be misattributed to whichever
    # query happens to run one first. Steady-state is what a long-lived
    # cluster session sees; cold-start is a fixed per-executor constant.
    region = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    region.count()
    region.groupBy("r_regionkey").applyInPandas(
        lambda pdf: pdf, schema=region.schema
    ).write.mode("overwrite").format("noop").save()

    timings: dict[str, float] = {}
    failed: dict[str, str] = {}
    for name, fn in qs.items():
        start = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            timings[name] = round(time.perf_counter() - start, 3)
        except Exception as exc:  # keep benching the rest
            failed[name] = f"{type(exc).__name__}: {exc}"

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "suite_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if failed:
        result["failed"] = failed
    print(json.dumps(result))


if __name__ == "__main__":
    main()
