"""Oracle + semantics tests for the isotonic / average-precision /
raking pack (queries/analytics39.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics39
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics39.ORACLE))
def test_analytics39_oracle(spark, duck, sf_dir, name):
    df = analytics39.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics39.ORACLE[name])


def test_isotonic_fit_is_monotone(spark, sf_dir):
    rows = analytics39.isotonic_hour_conversion(spark, sf_dir).collect()
    assert rows
    fits = [r["iso_micro"] for r in sorted(rows, key=lambda r: r["h"])]
    assert fits == sorted(fits)  # non-decreasing by construction
    for r in rows:
        assert 0 <= r["iso_micro"] <= 1_000_000
        assert r["pooled"] == (r["iso_micro"] != r["raw_micro"])


def test_average_precision_bounds(spark, sf_dir):
    r = analytics39.average_precision(spark, sf_dir).collect()[0]
    assert r["n_pos"] > 0
    # AP of any ranking sits between ~prevalence and 1
    assert (
        r["baseline_prevalence"] * 0.5
        <= r["average_precision"]
        <= 1.0 + 1e-9
    )


def test_raking_calibrates_margins(spark, sf_dir):
    r = analytics39.ipf_raking(spark, sf_dir).collect()[0]
    assert r["n_cells"] > 0 and r["n_events"] > 0
    total_mass = r["n_events"] * 1_000_000
    # after the final column sweep the column margins are near-exact;
    # row margins are within a small fraction of the total mass
    assert r["max_col_dev"] <= total_mass // 100
    assert r["max_row_dev"] <= total_mass // 10
    # calibration costs variance: ESS never exceeds n
    assert 0 < r["ess"] <= r["n_events"] + 1
