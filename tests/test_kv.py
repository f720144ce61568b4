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
