"""Oracle + semantics tests for the A/A-calibration / reconciliation /
capacity / permutation-entropy pack (queries/analytics33.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics33
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics33.ORACLE))
def test_analytics33_oracle(spark, duck, sf_dir, name):
    df = analytics33.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics33.ORACLE[name])


def test_aa_splits_cover_all_users(spark, sf_dir):
    rows = analytics33.aa_test_calibration(spark, sf_dir).collect()
    assert len(rows) == analytics33._AA_SPLITS
    n = rows[0]["n0"] + rows[0]["n1"]
    for r in rows:
        assert r["n0"] + r["n1"] == n
        if r["z"] is not None:
            assert r["significant"] == (abs(r["z"]) > 1.96)
        else:
            assert r["significant"] is False
    # a calibrated null harness should not cross on (nearly) every split
    crossings = sum(1 for r in rows if r["significant"])
    assert crossings <= analytics33._AA_SPLITS - 1


def test_reconciliation_coherence(spark, sf_dir):
    rows = analytics33.forecast_reconciliation(spark, sf_dir).collect()
    assert rows
    by_region: dict[str, list] = {}
    for r in rows:
        by_region.setdefault(r["r_name"], []).append(r)
    for region, rs in by_region.items():
        bu = sum(r["bu_forecast"] for r in rs)
        td = sum(r["td_forecast"] for r in rs)
        # Hamilton allocation sums EXACTLY to the region forecast
        assert td == bu, region
        for r in rs:
            assert r["gap_kd"] == r["bu_forecast"] - r["td_forecast"]


def test_capacity_profile_invariants(spark, sf_dir):
    r = analytics33.capacity_profile(spark, sf_dir).collect()[0]
    assert r["peak_n"] >= r["p95_n"]
    assert r["mean_n_micro"] <= r["peak_n"] * 1_000_000
    assert 0 < r["load_factor_micro"] <= 1_000_000
    assert 0 <= r["peak_wd"] <= 6 and 0 <= r["peak_hour"] <= 23


def test_permutation_entropy_bounds(spark, sf_dir):
    r = analytics33.permutation_entropy(spark, sf_dir).collect()[0]
    assert r["n"] > 0
    assert 1 <= r["n_patterns"] <= 6
    assert 0.0 <= r["normalized_pe"] <= 1.0 + 1e-9
