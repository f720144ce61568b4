"""Golden oracle tests for the events time-series pack (T17)."""

import pyspark.sql.functions as F
import pytest

from bigdatamanagement_spark.queries import events
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(events.ORACLE))
def test_events_oracle(spark, duck, sf_dir, name):
    df = events.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, events.ORACLE[name])


def test_rollup_cascade_levels_agree(spark, sf_dir):
    """hour→day→month partial re-reduction must equal direct aggregation
    of raw at every level (count/sum/min/max decomposability)."""
    import pyspark.sql.functions as F

    from bigdatamanagement_spark.operators.downsample import rollup_cascade
    from bigdatamanagement_spark.queries.events import _events

    ev = _events(spark, sf_dir)
    levels = rollup_cascade(ev)
    for unit in ("hour", "day", "month"):
        direct = (
            ev.groupBy(
                "event_type", F.date_trunc(unit, F.col("ts")).alias("bucket_ts")
            )
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("value"), 6).alias("sum_v"),
                F.min("value").alias("min_v"),
                F.max("value").alias("max_v"),
            )
        )
        got = levels[unit].select(
            "event_type", "bucket_ts", "n",
            F.round("sum_v", 6).alias("sum_v"), "min_v", "max_v",
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, direct.collect())
        )


def test_approx_distinct_within_rsd(spark, sf_dir):
    """HLL++ estimate must sit within 3x the requested 2% relative error
    of the exact distinct count for every group."""
    import pyspark.sql.functions as F

    from bigdatamanagement_spark.queries.events import (
        _events,
        approx_distinct_users_by_type,
    )

    approx = {
        r.event_type: r.approx_users
        for r in approx_distinct_users_by_type(spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.n
        for r in _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(1, 0.06 * exact[k]), (
            k, approx[k], exact[k],
        )


def test_approx_quantiles_rank_guarantee(spark, sf_dir):
    """percentile_approx's actual contract is a RANK bound, not a value
    bound (the returned order statistic can be far from the interpolated
    exact value in a sparse tail): at accuracy=10000 the returned value's
    rank must be within ~1/10000 (+ one discrete step) of the target.
    Verify by recomputing each returned value's empirical CDF position."""
    from bigdatamanagement_spark.catalog import load_testdata

    ev = load_testdata(spark, sf_dir, tables=("events",), register=False)["events"]
    per_type = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    approx = {
        r["event_type"]: (r["p50"], r["p90"], r["p99"])
        for r in events.QUERIES["t17_approx_value_quantiles_by_type"](spark, sf_dir).collect()
    }
    vals = {
        et: sorted(
            r["value"]
            for r in ev.filter(F.col("event_type") == et).select("value").collect()
        )
        for et in approx
    }
    import bisect

    for et, qs in approx.items():
        n = per_type[et]
        step = 1.0 / n
        for q, a in zip((0.5, 0.9, 0.99), qs):
            # a is ROUND(actual_value, 4); rank of the nearest value
            lo = bisect.bisect_left([round(v, 4) for v in vals[et]], a) / n
            hi = bisect.bisect_right([round(v, 4) for v in vals[et]], a) / n
            assert lo - 2 * step <= q <= hi + 2 * step, (et, q, a, lo, hi, n)
