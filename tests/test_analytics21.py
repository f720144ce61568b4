"""Oracle + semantics tests for the all-integer-bootstrap / k-truss /
spectral / renewal pack (queries/analytics21.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics21
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics21.ORACLE))
def test_analytics21_oracle(spark, duck, sf_dir, name):
    df = analytics21.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics21.ORACLE[name])


def test_bootstrap_median_all_integers(spark, sf_dir):
    r = analytics21.bootstrap_median_ci(spark, sf_dir).collect()[0]
    assert r["n_replicas"] == analytics21._BOOT_B
    assert r["ci_lo_centi"] <= r["median_centi"] <= r["ci_hi_centi"] or (
        # replica medians concentrate; allow the full median to sit at
        # the CI edge but never outside by much at tiny SF
        abs(r["median_centi"] - r["ci_lo_centi"])
        <= abs(r["ci_hi_centi"] - r["ci_lo_centi"]) + 1
    )
    for k in ("median_centi", "ci_lo_centi", "ci_hi_centi"):
        assert isinstance(r[k], int)


def test_ktruss_subset_of_kcore_edges(spark, sf_dir):
    rows = {r["round"]: r for r in analytics21.ktruss_peel(spark, sf_dir).collect()}
    assert set(rows) == {1, 2}
    assert rows[2]["n_edges"] <= rows[1]["n_edges"]
    for r in rows.values():
        assert r["n_edges"] >= 0 and r["n_triangles"] >= 0


def test_spectral_power_nonnegative(spark, sf_dir):
    r = analytics21.weekly_spectral_power(spark, sf_dir).collect()[0]
    assert r["n_days"] == analytics21._SPECTRAL_DAYS
    assert r["weekly_power"] >= 0.0
    assert r["dc_power"] > r["weekly_power"]  # DC dominates any harmonic


def test_renewal_buckets_ordered_means(spark, sf_dir):
    rows = {r["bucket"]: r for r in
            analytics21.renewal_expectation_table(spark, sf_dir).collect()}
    assert rows
    for name, r in rows.items():
        assert r["n_pairs"] > 0
        lo = {"a_0_7": 0, "b_8_30": 8, "c_31_90": 31, "d_90_plus": 91}[name]
        hi = {"a_0_7": 7, "b_8_30": 30, "c_31_90": 90,
              "d_90_plus": 10**9}[name]
        assert lo <= r["mean_gap_days"] <= hi
