"""Golden oracle tests for the KV/leaderboard pack (T15)."""

import pytest

from bigdatamanagement_spark.queries import kv
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(kv.QUERIES))
def test_kv_oracle(spark, duck, sf_dir, name):
    df = kv.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, kv.ORACLE[name])


def test_q5_returns_10_with_ties_broken(spark, sf_dir):
    rows = kv.top10_leaderboard_emails(spark, sf_dir).collect()
    assert len(rows) == 10
    # scores non-increasing; ties broken by user_id asc
    for a, b in zip(rows, rows[1:]):
        assert (a.score, ) >= (b.score, )
        if a.score == b.score:
            assert a.user_id < b.user_id


def test_q4_filter_has_matches(spark, sf_dir):
    """FIXTURES §C2 constraint: females in China/Russia at lat 40-46 exist."""
    assert kv.female_china_russia(spark, sf_dir).count() > 0


def test_zinter_recent_top10_nonvacuous(spark, sf_dir):
    rows = kv.zinter_recent_top10(spark, sf_dir).collect()
    assert len(rows) == 10  # the intersection has ≥10 members (408 observed)
    for a, b in zip(rows, rows[1:]):
        assert (a.zscore,) >= (b.zscore,)
        if a.zscore == b.zscore:
            assert a.user_id < b.user_id


def test_zunion_weighted_both_branch_on_crafted_sets(spark):
    """The fixture's leaderboards are disjoint, so pin the 'both'
    membership class (max of weighted scores) on a crafted frame."""
    import pyspark.sql.functions as F

    s = spark.createDataFrame(
        [("u1", 10, "leaderboard:2"), ("u1", 30, "leaderboard:3"),
         ("u2", 5, "leaderboard:2")],
        schema="user_id string, score int, leaderboard string",
    )
    agg = s.groupBy("user_id").agg(
        F.max(F.when(F.col("leaderboard") == "leaderboard:2", 2 * F.col("score"))).alias("w2"),
        F.max(F.when(F.col("leaderboard") == "leaderboard:3", F.col("score"))).alias("w3"),
    )
    got = {
        r["user_id"]: (r["w2"], r["w3"])
        for r in agg.collect()
    }
    assert got == {"u1": (20, 30), "u2": (10, None)}
