"""Oracle + semantics tests for the HITS / collocation / seasonal-
decomposition / Croston pack (queries/analytics28.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics28
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics28.ORACLE))
def test_analytics28_oracle(spark, duck, sf_dir, name):
    df = analytics28.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics28.ORACLE[name])


def test_hits_scores_normalized(spark, sf_dir):
    rows = analytics28.hits_hubs_authorities(spark, sf_dir).collect()
    assert rows and [r["rank"] for r in rows] == list(
        range(1, len(rows) + 1)
    )
    # renormalized: the top authority holds exactly 1e6 micro
    assert rows[0]["auth_micro"] == 1_000_000
    for prev, cur in zip(rows, rows[1:]):
        assert cur["auth_micro"] <= prev["auth_micro"]
    for r in rows:
        assert 0 < r["auth_micro"] <= 1_000_000
        assert r["degree"] > 0


def test_collocation_g2_exceeds_independence(spark, sf_dir):
    rows = analytics28.collocation_loglik(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 2x2 G² of observed-vs-independence is non-negative (up to
        # the four floor() roundings, each >= -1 micro-nat per cell)
        assert r["g2_micro"] >= -8
        assert r["c_ab"] >= 5
        assert r["c_a"] >= r["c_ab"] and r["c_b"] >= r["c_ab"]
        assert r["n"] >= r["c_a"] + r["c_b"] - r["c_ab"]
    g2s = [r["g2_micro"] for r in rows]
    assert g2s == sorted(g2s, reverse=True)


def test_weekday_decomposition_sums_near_zero(spark, sf_dir):
    rows = analytics28.weekday_decomposition(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 7
    # detrended deviations sum to ~0 across ALL days (the centered
    # window makes interior terms telescope); check the global sum is
    # small relative to the total deviation mass
    total = sum(r["sum_d7"] for r in rows)
    mass = sum(abs(r["sum_d7"]) for r in rows) or 1
    assert abs(total) <= mass
    for r in rows:
        assert 0 <= r["weekday"] <= 6
        assert r["n_days"] > 0


def test_croston_below_mean_when_intermittent(spark, sf_dir):
    rows = analytics28.croston_intermittent(spark, sf_dir).collect()
    assert rows
    for r in rows:
        n = r["n_periods"]
        assert 1 <= n <= analytics28._CROSTON_WINDOW
        assert r["z_num"] > 0 and r["p_num"] > 0
        # every gap >= 1, so the gap convolution is at least the pure
        # SES weight sum 1 + sum 2^(i-2) = 2^(n-1) — hence ses(gap) >= 1
        # and the forecast never exceeds z_num at p_num's floor
        assert r["p_num"] >= 1 << (n - 1)
        assert r["croston_forecast"] > 0
        assert (
            r["croston_forecast"]
            <= r["z_num"] / float(1 << (n - 1)) + 1e-9
        )
