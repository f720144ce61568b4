"""Oracle + semantics tests for the association-inference pack
(queries/analytics45.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics45
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics45.ORACLE))
def test_analytics45_oracle(spark, duck, sf_dir, name):
    df = analytics45.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics45.ORACLE[name])


def test_partial_correlation_bounds(spark, sf_dir):
    r = analytics45.partial_correlation(spark, sf_dir).collect()[0]
    for c in ("r_xy", "r_xz", "r_yz", "partial_r_xy_given_z"):
        assert -1.0 - 1e-9 <= r[c] <= 1.0 + 1e-9


def test_odds_ratio_ci_brackets(spark, sf_dir):
    r = analytics45.odds_ratio_ci(spark, sf_dir).collect()[0]
    assert r["a"] + r["b"] + r["c"] + r["d"] > 0
    # Haldane-corrected OR is always finite and positive
    assert r["ci_lo"] <= r["odds_ratio"] <= r["ci_hi"]
    assert r["odds_ratio"] > 0


def test_mcnemar_cells_partition_users(spark, sf_dir):
    r = analytics45.mcnemar_paired(spark, sf_dir).collect()[0]
    total = r["both_conv"] + r["b"] + r["c"] + r["neither"]
    assert total > 0
    if r["mcnemar_chi2"] is not None:
        assert r["mcnemar_chi2"] >= 0


def test_kappa_bounds(spark, sf_dir):
    r = analytics45.cohens_kappa(spark, sf_dir).collect()[0]
    assert 0 <= r["agree"] <= r["n"]
    assert -1.0 - 1e-9 <= r["kappa"] <= 1.0 + 1e-9
