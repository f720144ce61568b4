"""T73 histogram-quantile windows: oracle golden plus the pins the
construction promises — error bounded by one bucket width, estimates
monotone in p (p95 >= p50), and the merge algebra equals a direct
rebuild of the fanned window histogram."""

from __future__ import annotations

import pyspark.sql.functions as F

from bigdatamanagement_spark.queries import analytics55
from tests.conftest import assert_matches_oracle


def test_t73_matches_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        analytics55.histogram_quantile_windows(spark, sf_dir),
        duck,
        analytics55.ORACLE["t73_histogram_quantile_windows"],
    )


def test_t73_error_bounds_and_monotonicity(spark, sf_dir):
    rows = analytics55.histogram_quantile_windows(spark, sf_dir).collect()
    assert rows
    w = analytics55.BUCKET_CENTS
    for r in rows:
        assert 1 <= r.err_p50_cents <= w, r
        assert 1 <= r.err_p95_cents <= w, r
        assert r.est_p95_cents >= r.est_p50_cents, r
        assert r.exact_p95_cents >= r.exact_p50_cents, r


def test_t73_merge_equals_rebuild(spark, sf_dir):
    """Bucket-wise SUM of daily partials over the window == histogram
    of the window's fanned events directly — the mergeability claim."""
    ev = analytics55._cents(spark, sf_dir)
    span = ev.agg(F.max("day").alias("hi"))
    fan_ev = ev.join(F.broadcast(span)).select(
        F.explode(
            F.expr(
                f"sequence(day, least(date_add(day, "
                f"{analytics55.WINDOW_DAYS - 1}), hi))"
            )
        ).alias("window_day"),
        F.expr(f"cents DIV {analytics55.BUCKET_CENTS}").alias("bucket"),
    )
    direct = (
        fan_ev.groupBy("window_day", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    daily = (
        ev.select(
            "day", F.expr(f"cents DIV {analytics55.BUCKET_CENTS}").alias("bucket")
        )
        .groupBy("day", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    merged = (
        daily.join(F.broadcast(span))
        .select(
            F.explode(
                F.expr(
                    f"sequence(day, least(date_add(day, "
                    f"{analytics55.WINDOW_DAYS - 1}), hi))"
                )
            ).alias("window_day"),
            "bucket",
            "cnt",
        )
        .groupBy("window_day", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    diff = (
        merged.join(direct, ["window_day", "bucket"], "full")
        .where(
            F.coalesce(merged["cnt"], F.lit(-1))
            != F.coalesce(direct["cnt"], F.lit(-2))
        )
        .count()
    )
    assert diff == 0
