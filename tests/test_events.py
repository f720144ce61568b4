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


def test_funnel_strict_order_semantics(spark):
    """Crafted events: a user whose purchase precedes the click must not
    count as step 4; equal timestamps never advance a step (strict >)."""
    import datetime as dt

    from bigdatamanagement_spark.operators.funnel import funnel_counts, funnel_reach

    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        # u1: clean full funnel
        (1, t0, "signup"), (1, t0 + s, "view"), (1, t0 + 2 * s, "click"),
        (1, t0 + 3 * s, "purchase"),
        # u2: purchase BEFORE click -> reaches click only
        (2, t0, "signup"), (2, t0 + s, "view"), (2, t0 + 2 * s, "purchase"),
        (2, t0 + 3 * s, "click"),
        # u3: view at the SAME instant as signup -> strict > blocks step 2
        (3, t0, "signup"), (3, t0, "view"),
        # u4: never signed up -> reaches nothing
        (4, t0, "view"), (4, t0 + s, "click"), (4, t0 + 2 * s, "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    steps = ["signup", "view", "click", "purchase"]
    got = {r.step_no: (r.n_users, r.conv_bp) for r in funnel_counts(df, steps).collect()}
    assert got == {1: (3, 10000), 2: (2, 6666), 3: (2, 6666), 4: (1, 3333)}
    reach = {r.user_id: (r.t1, r.t2, r.t3, r.t4) for r in funnel_reach(df, steps).collect()}
    assert reach[2][3] is None and reach[2][2] is not None
    assert reach[3][1] is None
    assert reach[4] == (None, None, None, None)


def test_cohort_retention_invariants(spark, sf_dir):
    """Offset 0 is always 10000 bp with n_active = cohort_size; n_active
    never exceeds cohort_size; offsets within bounds."""
    rows = events.cohort_retention_daily(spark, sf_dir).collect()
    assert rows
    seen0 = 0
    for r in rows:
        assert 0 <= r.day_offset <= 7
        assert r.n_active <= r.cohort_size
        if r.day_offset == 0:
            assert r.n_active == r.cohort_size and r.retention_bp == 10000
            seen0 += 1
    assert seen0 == len({r.cohort_day for r in rows})


def test_transition_matrix_row_shares(spark, sf_dir):
    """Per prev_type: floor'd shares sum within [10000 - (k-1), 10000]
    and n sums match; every event_type appears as a prev."""
    rows = events.event_transition_matrix(spark, sf_dir).collect()
    by_prev = {}
    for r in rows:
        by_prev.setdefault(r.prev_type, []).append(r)
    assert len(by_prev) == 5
    for rs in by_prev.values():
        s = sum(r.share_bp for r in rs)
        assert 10000 - (len(rs) - 1) <= s <= 10000


def test_gapfill_dense_grid_and_locf(spark, sf_dir):
    """Grid is dense (one row per hour in each key's span), gap rows are
    zero-count, and LOCF equals the chronologically previous observed
    hourly sum — checked on a crafted frame with a 3-hour hole."""
    import datetime as dt

    import pyspark.sql.functions as F

    from bigdatamanagement_spark.operators.gapfill import gapfill_locf_hourly

    rows = [
        ("a", dt.datetime(2024, 1, 1, 0, 10), 1.5),
        ("a", dt.datetime(2024, 1, 1, 0, 40), 2.5),
        ("a", dt.datetime(2024, 1, 1, 4, 5), 10.0),
        ("b", dt.datetime(2024, 1, 1, 2, 0), 7.0),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = gapfill_locf_hourly(df, ["event_type"], "ts", "value")
    got = {(r.event_type, r.hr.hour): r for r in out.collect()}
    assert len(got) == 6  # a: hours 0..4 (5 rows), b: hour 2 only
    for h in (1, 2, 3):
        r = got[("a", h)]
        assert r.is_gap == 1 and r.n_events == 0 and r.sum_value_micro == 0
        assert r.locf_value_micro == 4_000_000  # carried from hour 0 (1.5+2.5)
    assert got[("a", 4)].locf_value_micro == 10_000_000
    assert got[("b", 2)].is_gap == 0 and got[("b", 2)].sum_value_micro == 7_000_000


def test_pagerank_semantics(spark):
    """On a crafted sink-free 3-node graph: (a) total rank mass stays
    ≈ 1e6 (floor losses only), (b) the node every edge points at outranks
    the others, (c) the 5-iteration result is reproducible exactly (pure
    integer arithmetic)."""
    from bigdatamanagement_spark.operators.pagerank import pagerank

    edges = spark.createDataFrame(
        [("a", "c", 3), ("b", "c", 1), ("c", "a", 2), ("c", "b", 2)],
        "src string, dst string, w long",
    )
    out1 = {r.node: r.rank_micro for r in pagerank(edges, iters=5).collect()}
    out2 = {r.node: r.rank_micro for r in pagerank(edges, iters=5).collect()}
    assert out1 == out2
    assert set(out1) == {"a", "b", "c"}
    assert out1["c"] > out1["a"] == out1["b"]  # a, b: teleport-only twins
    total = sum(out1.values())
    assert 900000 < total <= 1000000  # floors only ever lose mass
