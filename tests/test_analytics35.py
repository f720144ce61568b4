"""Oracle + semantics tests for the variance-ratio / Hurst /
trend-test / Bass-diffusion pack (queries/analytics35.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics35
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics35.ORACLE))
def test_analytics35_oracle(spark, duck, sf_dir, name):
    df = analytics35.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics35.ORACLE[name])


def test_variance_ratio_sane(spark, sf_dir):
    r = analytics35.variance_ratio_test(spark, sf_dir).collect()[0]
    assert r["n1"] > r["nq"] > 0
    assert r["vr5"] > 0
    # n-scaled variance numerators are non-negative
    assert r["n1"] * r["q1"] - r["s1"] * r["s1"] >= 0
    assert r["nq"] * r["qq"] - r["sq"] * r["sq"] >= 0


def test_hurst_window_counts(spark, sf_dir):
    r = analytics35.hurst_rs(spark, sf_dir).collect()[0]
    assert r["k_a"] >= 1
    assert r["rs_a"] > 0
    if r["k_b"] == 0:
        # the corpus spans fewer than 32 days (true at sf0.001):
        # the long scale is empty and H undefined by design
        assert r["rs_b"] is None and r["hurst"] is None
        return
    # 32-day windows are at most a quarter as numerous as 8-day ones
    assert r["k_b"] <= r["k_a"]
    assert r["rs_b"] > 0
    # mean R/S grows with window size (R/S ~ w^H with H > 0)
    assert r["rs_b"] / r["k_b"] > r["rs_a"] / r["k_a"]


def test_cochran_armitage_moments(spark, sf_dir):
    r = analytics35.cochran_armitage_trend(spark, sf_dir).collect()[0]
    assert r["n_buckets"] == 4
    assert 0 < r["cc"] < r["nn"]
    assert r["scy"] <= 3 * r["cc"]
    assert r["sny"] <= 3 * r["nn"]
    assert abs(r["z"]) < 100


def test_bass_fit_shape(spark, sf_dir):
    r = analytics35.bass_diffusion_fit(spark, sf_dir).collect()[0]
    assert r["n"] >= 3  # enough weeks to fit 3 params
    # efficiency check: b1 relates p and q up to the fit's own gap
    assert (
        r["b1_consistency_gap"]
        == r["b1_micro"] - (r["q_micro"] - r["p_micro"])
    )
