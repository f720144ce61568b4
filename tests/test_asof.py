"""Unit tests for the as-of join operator: backward carry, exact-match
inclusivity, left-join nulls, tolerance bound. The events-pack oracle
test (t17_last_purchase_asof vs DuckDB ASOF LEFT JOIN) covers scale."""

import datetime as dt

import pyspark.sql.functions as F

from bigdatamanagement_spark.operators.asof import asof_join


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", _ts(5)),   # after both r1,r2 -> r2
            (2, "k1", _ts(2)),   # exactly at r1 -> r1 (inclusive)
            (3, "k1", _ts(1)),   # before everything -> null
            (4, "k2", _ts(9)),   # other key -> its own r3
            (5, "k3", _ts(9)),   # key with no right rows -> null
        ],
        "event_id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k1", _ts(2), 10.0),  # r1
            ("k1", _ts(4), 20.0),  # r2
            ("k2", _ts(3), 30.0),  # r3
        ],
        "k string, rts timestamp, px double",
    )
    return left, right


def test_asof_backward_carry_and_nulls(spark):
    left, right = _frames(spark)
    out = {
        r.event_id: (r.rts, r.px)
        for r in asof_join(left, right, "k", "ts", "rts").collect()
    }
    assert out[1] == (_ts(4), 20.0)   # latest at-or-before
    assert out[2] == (_ts(2), 10.0)   # exact timestamp match included
    assert out[3] == (None, None)     # nothing before
    assert out[4] == (_ts(3), 30.0)   # per-key isolation
    assert out[5] == (None, None)     # key absent from right
    assert len(out) == 5              # left join: every left row kept


def test_asof_tolerance_nulls_stale_matches(spark):
    left, right = _frames(spark)
    out = {
        r.event_id: (r.rts, r.px)
        for r in asof_join(
            left, right, "k", "ts", "rts", tolerance="1 days"
        ).collect()
    }
    assert out[1] == (_ts(4), 20.0)   # 1 day back: still in range
    assert out[2] == (_ts(2), 10.0)   # 0 back
    assert out[4] == (None, None)     # 6 days back: stale -> null
    assert out[3] == (None, None) and out[5] == (None, None)


def test_asof_preserves_all_left_columns(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, "k", "ts", "rts")
    assert out.columns == ["event_id", "k", "ts", "rts", "px"]
    assert out.count() == left.count()


def test_interval_join_inclusive_bounds_and_bucket_edges(spark):
    """Window bounds are inclusive and matches crossing bucket boundaries
    are not lost (the ≤2-bucket coverage guarantee)."""
    from bigdatamanagement_spark.operators.rangejoin import interval_join

    left = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 12, 0, 0))], "lid long, lts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, dt.datetime(2024, 1, 1, 11, 55, 0)),   # exactly -300s: in
            (11, dt.datetime(2024, 1, 1, 12, 5, 0)),    # exactly +300s: in
            (12, dt.datetime(2024, 1, 1, 11, 54, 59)),  # -301s: out
            (13, dt.datetime(2024, 1, 1, 12, 5, 1)),    # +301s: out
            (14, dt.datetime(2024, 1, 1, 12, 0, 1)),    # inside
        ],
        "rid long, rts timestamp",
    )
    got = {
        r.rid
        for r in interval_join(left, right, "lts", "rts", -300, 300).collect()
    }
    assert got == {10, 11, 14}


def test_interval_join_matches_naive_crossjoin(spark):
    """Bucketized result must equal the naive theta-join on a dense grid
    (every alignment of timestamps vs bucket boundaries exercised)."""
    from bigdatamanagement_spark.operators.rangejoin import interval_join

    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(seconds=37 * i)) for i in range(120)]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    left = df.select(F.col("id").alias("lid"), F.col("ts").alias("lts"))
    right = df.select(F.col("id").alias("rid"), F.col("ts").alias("rts"))
    got = {
        (r.lid, r.rid)
        for r in interval_join(left, right, "lts", "rts", -100, 100).collect()
    }
    want = {
        (l[0], r[0])
        for l in rows
        for r in rows
        if -100 <= (r[1] - l[1]).total_seconds() <= 100
    }
    assert got == want and want


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_row = st.tuples(
    st.sampled_from(["a", "b", "c"]),           # key
    st.integers(min_value=0, max_value=500),    # seconds offset
)


@given(left=st.lists(_row, min_size=1, max_size=25),
       right=st.lists(_row, min_size=1, max_size=25))
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_asof_matches_pandas_merge_asof(spark, left, right):
    """Property: asof_join ≡ pandas merge_asof (backward, exact matches
    allowed) on random keyed timestamp data. Right (key, ts) pairs are
    deduped first — both implementations only promise a deterministic
    pick for unique right keys."""
    import pandas as pd

    base = dt.datetime(2024, 1, 1)
    lrows = [
        (i, k, base + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(left)
    ]
    seen, rrows = set(), []
    for k, s in right:
        if (k, s) not in seen:
            seen.add((k, s))
            rrows.append((k, base + dt.timedelta(seconds=s), float(s)))
    ldf = spark.createDataFrame(lrows, "lid long, k string, ts timestamp")
    rdf = spark.createDataFrame(rrows, "k string, rts timestamp, px double")
    got = {
        r.lid: (r.rts, r.px) for r in asof_join(ldf, rdf, "k", "ts", "rts").collect()
    }
    lpd = pd.DataFrame(lrows, columns=["lid", "k", "ts"]).sort_values("ts")
    rpd = pd.DataFrame(rrows, columns=["k", "rts", "px"]).sort_values("rts")
    merged = pd.merge_asof(
        lpd, rpd, left_on="ts", right_on="rts", by="k", direction="backward"
    )
    want = {
        int(r.lid): (
            None if pd.isna(r.rts) else r.rts.to_pydatetime(),
            None if pd.isna(r.px) else float(r.px),
        )
        for r in merged.itertuples()
    }
    assert got == want


def test_interval_join_extra_key_isolates_groups(spark):
    """extra_key must scope window matches to equal-key rows only."""
    from bigdatamanagement_spark.operators.rangejoin import interval_join

    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, "u1", base), (2, "u2", base)], "lid long, u string, lts timestamp"
    )
    right = spark.createDataFrame(
        [(10, "u1", base + dt.timedelta(seconds=5))], "rid long, u string, rts timestamp"
    )
    got = {
        (r.lid, r.rid)
        for r in interval_join(
            left, right, "lts", "rts", -60, 60, extra_key="u"
        ).collect()
    }
    assert got == {(1, 10)}
