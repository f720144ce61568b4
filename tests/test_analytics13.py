"""Oracle + semantics tests for the counterfactual-evaluation /
graph-robustness / IR-statistics pack (queries/analytics13.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics13
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics13.ORACLE))
def test_analytics13_oracle(spark, duck, sf_dir, name):
    df = analytics13.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics13.ORACLE[name])


def test_ips_matches_imply_bounds(spark, sf_dir):
    r = analytics13.ips_policy_value(spark, sf_dir).collect()[0]
    assert 0 < r["n_matched"] <= r["n_events"]
    # importance weights are >= 1 for the majority action, so the IPS
    # sum dominates the matched raw reward
    assert r["ips_sum_centi"] >= r["matched_reward_centi"]
    assert r["ips_value_centi"] > 0


def test_assortativity_in_range(spark, sf_dir):
    r = analytics13.degree_assortativity(spark, sf_dir).collect()[0]
    assert -1.0 - 1e-12 <= r["assortativity"] <= 1.0 + 1e-12
    assert r["n"] > 0 and r["n"] % 2 == 0  # both orientations counted


def test_percolation_monotone(spark, sf_dir):
    rows = {
        r["threshold"]: r
        for r in analytics13.percolation_sweep(spark, sf_dir).collect()
    }
    assert set(rows) == set(analytics13._PERC_THRESHOLDS)
    for lo, hi in zip((2, 3), (3, 4)):
        assert rows[hi]["n_edges"] <= rows[lo]["n_edges"]
        assert rows[hi]["n_vertices"] <= rows[lo]["n_vertices"]
        assert rows[hi]["largest_component"] <= rows[lo]["largest_component"]


def test_burstiness_at_least_one(spark, sf_dir):
    rows = analytics13.token_burstiness(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["cf"] >= r["df"] >= 5
        assert r["burstiness_micro"] >= analytics13._MICRO


def test_pythagorean_inequality(spark, sf_dir):
    rows = analytics13.pythagorean_means(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # AM >= GM >= HM (floored-log / floored-reciprocal slack is
        # far below the means' scale)
        assert r["arith_centi"] >= r["geo_centi"] * (1 - 1e-5)
        assert r["geo_centi"] >= r["harm_centi"] * (1 - 1e-5)
