"""Golden oracle tests for the events time-series pack (T17)."""

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
