"""Oracle + semantics tests for the log-rank / Huber / SMA-backtest /
service-level pack (queries/analytics30.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics30
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics30.ORACLE))
def test_analytics30_oracle(spark, duck, sf_dir, name):
    df = analytics30.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics30.ORACLE[name])


def test_logrank_moment_identities(spark, sf_dir):
    r = analytics30.logrank_test(spark, sf_dir).collect()[0]
    assert r["n_subjects"] > 0
    assert 0 <= r["o1"] <= r["n_deaths"]
    # E1 is a convex combination of deaths: 0 <= E1 <= deaths (in micro)
    assert 0 <= r["e1_micro"] <= r["n_deaths"] * 1_000_000
    assert r["v_micro"] >= 0
    if r["v_micro"] > 0:
        assert abs(r["z"]) < 50  # sane magnitude, not a unit bug


def test_huber_bounded_by_band(spark, sf_dir):
    r = analytics30.huber_location(spark, sf_dir).collect()[0]
    assert r["n_days"] > 0 and r["k_dollars"] >= 1
    # one IRLS step moves the center at most k from the previous one
    # (the weighted mean of clamped influences stays inside the band
    # around the previous center up to integer floors)
    assert abs(r["huber_round1"] - r["median_dollars"]) <= r["k_dollars"] + 1
    assert abs(r["huber_round2"] - r["huber_round1"]) <= r["k_dollars"] + 1


def test_sma_backtest_consistency(spark, sf_dir):
    rows = analytics30.sma_crossover_backtest(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_signal_days"] <= r["n_days"]
        # at most one flip between consecutive signal days
        assert r["n_trades"] <= max(0, r["n_signal_days"] - 1) + 1


def test_service_backtest_bounds(spark, sf_dir):
    rows = analytics30.newsvendor_service_backtest(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["hits"] <= r["n_test"]
        assert 0 <= r["service_micro"] <= 1_000_000
        assert r["stock_level"] > 0
