"""Oracle + semantics tests for the forecasting-completion /
parametric-tests / gaps-and-islands pack (queries/analytics14.py)."""

from __future__ import annotations

import math

import pytest

from bigdatamanagement_spark.queries import analytics14
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics14.ORACLE))
def test_analytics14_oracle(spark, duck, sf_dir, name):
    df = analytics14.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics14.ORACLE[name])


def test_holt_python_recount(spark, duck, sf_dir):
    """Recompute the Holt backtest with the plain float recursion and
    compare the MAE to 1e-12 relative."""
    days = duck.execute(
        """SELECT day, x FROM (
               SELECT CAST(ts AS DATE) AS day,
                      SUM(CAST(round(value * 100, 0) AS BIGINT)) AS x
               FROM events WHERE event_type = 'purchase'
               GROUP BY 1 ORDER BY day DESC LIMIT 14) ORDER BY day"""
    ).fetchall()
    xs = [float(x) for _, x in days]
    level, trend = xs[1], xs[1] - xs[0]
    errs = []
    for x in xs[2:]:
        errs.append(abs(x - (level + trend)))
        new_level = (x + level + trend) / 2.0
        trend = (new_level - level) / 2.0 + trend / 2.0
        level = new_level
    want = sum(errs) / len(errs)
    got = analytics14.holt_backtest(spark, sf_dir).collect()[0]
    assert got["n_fc"] == len(errs)
    assert math.isclose(got["mae_cents"], want, rel_tol=1e-9)


def test_holt_coef_table_row_sums(spark, sf_dir):
    """On a constant series x_i = c, Holt must forecast c exactly:
    sum of (c_l + c_b) coefficients per t equals 4^t."""
    from collections import defaultdict

    sums = defaultdict(int)
    p4 = {}
    for t, i, cl, cb, p in analytics14._HOLT_COEFS:
        sums[t] += cl + cb
        p4[t] = p
    for t, s in sums.items():
        assert s == p4[t], t


def test_welch_against_python(spark, duck, sf_dir):
    rows = duck.execute(
        "SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) FROM events "
        "WHERE event_type IN ('purchase', 'click')"
    ).fetchall()
    g1 = [x for t, x in rows if t == "purchase"]
    g2 = [x for t, x in rows if t == "click"]
    m1, m2 = sum(g1) / len(g1), sum(g2) / len(g2)
    v1 = sum((x - m1) ** 2 for x in g1) / (len(g1) - 1)
    v2 = sum((x - m2) ** 2 for x in g2) / (len(g2) - 1)
    want_t = (m1 - m2) / math.sqrt(v1 / len(g1) + v2 / len(g2))
    got = analytics14.welch_t_test(spark, sf_dir).collect()[0]
    assert (got["n1"], got["n2"]) == (len(g1), len(g2))
    assert math.isclose(got["t_stat"], want_t, rel_tol=1e-9)
    assert got["dof"] > min(len(g1), len(g2)) - 1


def test_streaks_are_maximal(spark, duck, sf_dir):
    rows = analytics14.activity_streaks(spark, sf_dir).collect()
    assert rows
    n_span = duck.execute(
        "SELECT datediff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)))"
        " + 1 FROM events"
    ).fetchone()[0]
    for r in rows:
        assert 1 <= r["streak_days"] <= n_span


def test_gumbel_return_level_exceeds_mean(spark, sf_dir):
    r = analytics14.gumbel_return_level(spark, sf_dir).collect()[0]
    mean = r["s"] / r["n"]
    assert r["return_level_centi"] > mean  # 100-day level above the mean
    assert r["gumbel_beta_centi"] > 0


def test_moment_profile_plausible(spark, sf_dir):
    rows = analytics14.moment_profile(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r["skewness"]) < 50.0
        assert r["excess_kurtosis"] > -3.0


def test_geo_dispersion_diameter_bounds(spark, sf_dir):
    rows = analytics14.geo_dispersion(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["mean_dist_m"] <= r["diameter_m"]
        assert r["diameter_m"] < 21_000_000  # half the earth circumference
