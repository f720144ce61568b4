"""Oracle + semantics tests for the as-of-sweep / Brier-decomposition /
ratio-CI / retention-decay pack (queries/analytics31.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics31
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics31.ORACLE))
def test_analytics31_oracle(spark, duck, sf_dir, name):
    df = analytics31.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics31.ORACLE[name])


def test_asof_sweep_monotone_in_tolerance(spark, sf_dir):
    rows = {
        r["tolerance"]: r
        for r in analytics31.asof_tolerance_sweep(spark, sf_dir).collect()
    }
    assert set(rows) == {"10m", "1h", "1d", "inf"}
    n = rows["inf"]["n_clicks"]
    assert all(r["n_clicks"] == n for r in rows.values())
    # wider tolerance can only match more
    assert (
        rows["10m"]["matched"]
        <= rows["1h"]["matched"]
        <= rows["1d"]["matched"]
        <= rows["inf"]["matched"]
        <= n
    )


def test_brier_components_nonnegative(spark, sf_dir):
    r = analytics31.brier_decomposition(spark, sf_dir).collect()[0]
    assert r["reliability"] >= 0
    assert r["resolution"] >= 0
    assert 0 <= r["uncertainty"] <= 0.25
    # resolution never exceeds uncertainty (it is explained variance)
    assert r["resolution"] <= r["uncertainty"] + 1e-6


def test_ratio_ci_brackets_point_estimate(spark, sf_dir):
    r = analytics31.ratio_metric_ci(spark, sf_dir).collect()[0]
    assert r["n_users"] > 0 and r["s_clk"] > 0
    assert r["delta_se"] >= 0
    assert r["n_replicas"] == 32
    assert r["boot_lo"] <= r["boot_hi"]
    # half-sample replicas scatter AROUND the full-sample ratio
    assert r["boot_lo"] <= r["ratio_cents_per_click"] * 1.5
    assert r["boot_hi"] >= r["ratio_cents_per_click"] * 0.5


def test_retention_decay_shape(spark, sf_dir):
    r = analytics31.retention_halflife(spark, sf_dir).collect()[0]
    if r["n_ages"] == 0:
        # corpus spans too few months for any age >= 1 retention row
        # (true at sf0.001); the fit degenerates to NULLs by design
        assert r["halflife_months"] is None or r["n_ages"] == 0
        return
    assert r["sxx_n"] >= 0
    if r["slope_num"] is not None and r["slope_num"] < 0:
        assert r["halflife_months"] > 0
