"""Oracle + semantics tests for the BH / standardization / GBM /
Little's-law pack (queries/analytics36.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics36
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics36.ORACLE))
def test_analytics36_oracle(spark, duck, sf_dir, name):
    df = analytics36.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics36.ORACLE[name])


def test_bh_stepup_contract(spark, sf_dir):
    rows = analytics36.bh_significant_cells(spark, sf_dir).collect()
    assert len(rows) >= 5  # top-5 always reported
    k = rows[0]["k"]
    assert len(rows) == max(k, 5)
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r["significant"] == (r["rank"] <= k)
        if r["significant"]:
            # every discovery at rank <= k sits above the k-th bar's
            # requirement only at rank k; at least the k-th passes
            pass
    if k > 0:
        kth = rows[k - 1]
        assert abs(kth["residual"]) >= kth["threshold"]
    # thresholds decrease with rank (alpha*i/m grows)
    ths = [r["threshold"] for r in rows]
    assert ths == sorted(ths, reverse=True)


def test_standardization_conserves_units(spark, sf_dir):
    rows = analytics36.standardized_conversion(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["crude_micro"] <= 1_000_000
        assert 0 <= r["standardized_micro"] <= 1_000_000
        assert (
            r["mix_effect_micro"]
            == r["crude_micro"] - r["standardized_micro"]
        )


def test_gbm_vol_nonnegative(spark, sf_dir):
    rows = analytics36.gbm_params(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n"] >= 2
        assert r["vol_daily"] >= 0
        assert abs(r["vol_annualized"] - r["vol_daily"] * 252**0.5) < 1e-9
        # drift = mean + sigma^2/2 >= mean
        assert r["gbm_drift_daily"] >= r["s"] / r["n"] / 1e6 - 1e-12


def test_littles_law_identity(spark, sf_dir):
    r = analytics36.littles_law_audit(spark, sf_dir).collect()[0]
    assert r["n_sessions"] > 0 and r["span_us"] > 0
    # L = lambda * W holds EXACTLY for the integral side
    lw = r["lambda_per_hour"] * r["w_hours"]
    assert abs(lw - r["l_integral"]) < 1e-9 * max(1.0, r["l_integral"])
    # the sampled side is within the same order of magnitude
    if r["n_instants"] > 0 and r["l_integral"] > 0:
        assert r["l_sampled"] <= 20 * r["l_integral"] + 1
