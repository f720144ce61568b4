"""Oracle + semantics tests for the decayed-leaderboard /
session-sensitivity / price-dispersion / cross-source-dup pack
(queries/analytics34.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics34
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics34.ORACLE))
def test_analytics34_oracle(spark, duck, sf_dir, name):
    df = analytics34.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics34.ORACLE[name])


def test_decayed_leaderboard_bounds(spark, sf_dir):
    rows = analytics34.decayed_leaderboard(spark, sf_dir).collect()
    assert rows
    cap = 1 << analytics34._DECAY_CAP
    for r in rows:
        # weights are in [1, 2^CAP]: score between total and total*2^CAP
        assert r["total_qty"] <= r["decayed_score"] <= r["total_qty"] * cap
    scores = [r["decayed_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_session_gap_monotone(spark, sf_dir):
    rows = {
        r["gap"]: r
        for r in analytics34.session_gap_sensitivity(spark, sf_dir).collect()
    }
    assert set(rows) == {"5m", "30m", "2h"}
    # a looser gap can only merge sessions
    assert (
        rows["5m"]["n_sessions"]
        >= rows["30m"]["n_sessions"]
        >= rows["2h"]["n_sessions"]
        >= 1
    )
    n = rows["5m"]["n_events"]
    for r in rows.values():
        assert r["n_events"] == n
        assert r["n_sessions"] <= n


def test_price_dispersion_key_matches_cv(spark, sf_dir):
    rows = analytics34.price_dispersion_audit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # disp_key is milli-(1 + CV^2) up to integer floors
        approx = 1000.0 * (1.0 + r["cv"] ** 2)
        assert abs(r["disp_key"] - approx) <= max(20.0, approx * 0.05)
        assert r["n"] >= 5
    keys = [r["disp_key"] for r in rows]
    assert keys == sorted(keys, reverse=True)


def test_dup_matrix_symmetric_input(spark, sf_dir):
    rows = analytics34.cross_source_dup_matrix(spark, sf_dir).collect()
    for r in rows:
        assert r["shared_texts"] >= 1
        assert r["source_a"] <= r["source_b"]
