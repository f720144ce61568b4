"""Engine-wide plan-health gate (round-4 item 1): every query in the
__spark_entry__ registry must satisfy the global physical-plan
invariants — no row-at-a-time Python UDF, Arrow-Python only where
allowlisted, no CartesianProduct, every BroadcastNestedLoopJoin
broadcasting a bounded-by-construction subtree, and partition-less
windows only over audited bounded grids (plans/gate.py docstring).

One sweep, all violations reported together — a future pack that
regresses any invariant fails here with the offending plan snippet.
"""

import os

import pyspark.sql.functions as F
from pyspark.sql import Window

from bigdatamanagement_spark.plans.gate import audit_plan, gate_violations, sweep


def test_all_registered_queries_pass_plan_gate(spark, sf_dir):
    results = sweep(spark, sf_dir)
    assert len(results) >= 455, f"registry shrank? {len(results)}"
    violations = [v for vs in results.values() for v in vs]
    assert not violations, "\n".join(violations)


def test_gate_flags_event_grain_partitionless_window(spark, sf_dir):
    """Negative control: the exact anti-pattern the gate exists for —
    a bare Window.orderBy over a parquet-scanned event grain — must be
    flagged for a query name with no allowlist entry."""
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    bad = ev.withColumn(
        "rn", F.row_number().over(Window.orderBy("ts", "event_id"))
    )
    v = gate_violations("zz_not_allowlisted", audit_plan(bad))
    assert any("partition-less Window" in x for x in v), v


def test_gate_flags_unbounded_bnlj(spark, sf_dir):
    """Negative control: nest-loop-joining two raw parquet scans (no
    reduction on the broadcast side) must be flagged."""
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    bad = ev.join(
        F.broadcast(docs.select("doc_id")),
        F.col("event_id") < F.col("doc_id"),
    )
    v = gate_violations("zz_not_allowlisted", audit_plan(bad))
    assert any("BroadcastNestedLoopJoin" in x for x in v), v


def test_gate_flags_row_at_a_time_python_udf(spark, sf_dir):
    """Negative control: a row-at-a-time Python UDF is never allowed,
    not even for allowlisted Arrow queries."""
    from pyspark.sql.functions import udf

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    bad = ev.select(udf(lambda x: x + 1, "long")(F.col("event_id")))
    v = gate_violations("ext_multimodal_features", audit_plan(bad))
    assert any("BatchEvalPython" in x for x in v), v
