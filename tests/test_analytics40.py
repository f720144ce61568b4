"""Oracle + semantics tests for the Kruskal-Wallis / Brown-Forsythe /
periodogram pack (queries/analytics40.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics40
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics40.ORACLE))
def test_analytics40_oracle(spark, duck, sf_dir, name):
    df = analytics40.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics40.ORACLE[name])


def test_kruskal_wallis_moments(spark, sf_dir):
    r = analytics40.kruskal_wallis(spark, sf_dir).collect()[0]
    assert r["nn"] > 0 and r["tie_t"] >= 0
    group_total = sum(r[f"n_{t}"] for t in analytics40._TYPES)
    assert group_total == r["nn"]
    assert r["kw_h"] >= -1e-6  # H is non-negative up to FP


def test_brown_forsythe_nonnegative(spark, sf_dir):
    r = analytics40.brown_forsythe(spark, sf_dir).collect()[0]
    for t in analytics40._TYPES:
        assert r[f"n_{t}"] > 0
        assert r[f"s_{t}"] >= 0
    assert r["bf_f"] >= 0


def test_periodogram_shape(spark, sf_dir):
    rows = analytics40.periodogram_flatness(spark, sf_dir).collect()
    assert len(rows) == len(analytics40._PERIOD_KS)
    doms = [r for r in rows if r["dominant"]]
    assert len(doms) >= 1
    maxp = max(r["power_scaled"] for r in rows)
    for r in rows:
        assert r["power_scaled"] >= 0
        assert r["dominant"] == (r["power_scaled"] == maxp)
        # flatness is a geometric/arithmetic mean ratio in (0, 1]
        assert 0.0 < r["spectral_flatness"] <= 1.0 + 1e-6
