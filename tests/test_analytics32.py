"""Oracle + semantics tests for the funnel-timing / seasonal-strength /
perfect-order / Wilson-ranking pack (queries/analytics32.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics32
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics32.ORACLE))
def test_analytics32_oracle(spark, duck, sf_dir, name):
    df = analytics32.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics32.ORACLE[name])


def test_funnel_timing_ordering(spark, sf_dir):
    rows = {
        r["step"]: r
        for r in analytics32.funnel_step_timing(spark, sf_dir).collect()
    }
    assert set(rows) == {"signup_to_click", "click_to_purchase"}
    for r in rows.values():
        assert r["n_users"] > 0
        assert 0 <= r["median_secs"] <= r["p90_secs"]


def test_seasonal_strength_in_unit_interval(spark, sf_dir):
    r = analytics32.seasonal_strength(spark, sf_dir).collect()[0]
    assert r["n"] > 0
    assert 0.0 <= r["trend_strength"] <= 1.0
    assert 0.0 <= r["seasonal_strength"] <= 1.0
    # residual variance is non-negative
    assert r["n"] * r["q_r"] - r["s_r"] * r["s_r"] >= 0


def test_perfect_order_conjunction_bound(spark, sf_dir):
    rows = analytics32.perfect_order_rate(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["perfect_orders"] <= r["n_orders"]
        # the all-lines conjunction can never beat the per-line rate
        assert r["perfect_micro"] <= r["line_ok_micro"] + 1


def test_wilson_lcb_below_raw_rate(spark, sf_dir):
    rows = analytics32.wilson_lcb_leaderboard(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["wilson_lcb"] <= 1.0
        # the lower bound sits below the raw MLE
        assert r["wilson_lcb"] <= r["raw_micro"] / 1e6 + 1e-9
    lcbs = [r["wilson_lcb"] for r in rows]
    assert lcbs == sorted(lcbs, reverse=True)
