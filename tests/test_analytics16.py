"""Oracle + semantics tests for the experimentation-hygiene /
survival / signal-processing pack (queries/analytics16.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics16
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics16.ORACLE))
def test_analytics16_oracle(spark, duck, sf_dir, name):
    df = analytics16.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics16.ORACLE[name])


def test_hazard_table_conserves_users(spark, duck, sf_dir):
    rows = analytics16.discrete_hazard_table(spark, sf_dir).collect()
    n_purchasers = duck.execute(
        "SELECT COUNT(DISTINCT user_id) FROM events "
        "WHERE event_type = 'purchase'"
    ).fetchone()[0]
    assert rows and rows[0]["at_risk"] == n_purchasers  # week 0 risk set
    for r in rows:
        assert 0 <= r["d"] <= r["at_risk"]
        assert 0 <= r["hazard_micro"] <= analytics16._MICRO
    # at-risk is non-increasing in week
    for prev, cur in zip(rows, rows[1:]):
        assert cur["at_risk"] <= prev["at_risk"]


def test_srm_cells_sum(spark, duck, sf_dir):
    rows = {r["k_cells"]: r for r in analytics16.srm_check(spark, sf_dir).collect()}
    n_users = duck.execute(
        "SELECT COUNT(DISTINCT user_id) FROM events"
    ).fetchone()[0]
    assert rows[2]["n"] == rows[4]["n"] == n_users
    assert rows[2]["chi2"] >= 0 and rows[4]["chi2"] >= 0
    # 2-cell split is the mod-2 coarsening of the 4-cell split
    assert rows[2]["c0"] == rows[4]["c0"] + rows[4]["c2"]


def test_peaks_are_strict_maxima(spark, sf_dir):
    rows = analytics16.hourly_peaks(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["prominence"] >= 1  # strict > both neighbors


def test_deseason_devs_sum_to_zero_per_weekday(spark, sf_dir):
    rows = analytics16.deseason_anomaly_days(spark, sf_dir).collect()
    assert len(rows) == analytics16._ANOM_TOP_K
    for r in rows:
        assert 1 <= r["iso_weekday"] <= 7
        assert r["abs_dev_micro"] == abs(r["dev_micro"])


def test_burstiness_in_range(spark, sf_dir):
    rows = analytics16.interarrival_burstiness(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["burstiness"] < 1.0
        assert r["n"] > 10
