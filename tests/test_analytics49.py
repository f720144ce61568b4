"""Oracle + algebra tests for the mergeable-sketch window pack (T67)."""

import pyspark.sql.functions as F

from bigdatamanagement_spark.queries import analytics49
from tests.conftest import assert_matches_oracle


def test_t67_oracle(spark, duck, sf_dir):
    df = analytics49.hll_trailing_actives(spark, sf_dir)
    assert_matches_oracle(
        df, duck, analytics49.ORACLE["t67_hll_trailing_actives"]
    )


def test_t67_estimate_tracks_exact(spark, sf_dir):
    """m=64 HLL: every window's estimate within ±35% of exact (loose
    bound — 3σ at 1.04/sqrt(64) ≈ 13% σ), and the trailing window is
    monotone vs the single-day distinct (a window can never have fewer
    actives than its own last day)."""
    rows = analytics49.hll_trailing_actives(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r.err_bp) <= 3_500, r
        assert r.exact_actives > 0


def test_merge_equals_rebuild(spark, sf_dir):
    """The sketch-algebra property the whole pack rides on: merging
    daily register tables (register-wise MAX) gives the IDENTICAL
    register table to building one sketch over the concatenated days."""
    from bigdatamanagement_spark.operators.sketch import (
        portable_hll_registers,
    )

    ev = analytics49._events(spark, sf_dir).select(
        F.to_date("ts").alias("day"), "user_id"
    )
    days = sorted(
        r.day for r in ev.select("day").distinct().limit(3).collect()
    )[:2]
    sub = ev.filter(F.col("day").isin(days))
    merged = (
        portable_hll_registers(sub, "user_id", ["day"])
        .groupBy("reg")
        .agg(F.max("r").alias("r"))
    )
    rebuilt = portable_hll_registers(sub, "user_id", [])
    got = sorted((r.reg, r.r) for r in merged.collect())
    want = sorted((r.reg, r.r) for r in rebuilt.collect())
    assert got == want
