"""Oracle + semantics tests for the ML-primitive / forecasting /
market-basket pack (queries/analytics10.py)."""

from __future__ import annotations

import math

import pytest

from bigdatamanagement_spark.queries import analytics10
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics10.ORACLE))
def test_analytics10_oracle(spark, duck, sf_dir, name):
    df = analytics10.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics10.ORACLE[name])


def test_triples_apriori_property(spark, duck, sf_dir):
    """Every frequent triple's sub-pairs have support >= the triple's
    (Apriori downward closure)."""
    pair_support = dict(
        ((a, b), s)
        for a, b, s in duck.execute(
            """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
               SELECT a.l_partkey, b.l_partkey, COUNT(*)
               FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey GROUP BY 1, 2"""
        ).fetchall()
    )
    rows = analytics10.frequent_triples(spark, sf_dir).collect()
    assert rows
    for r in rows:
        for pair in ((r["a"], r["b"]), (r["a"], r["c"]), (r["b"], r["c"])):
            assert pair_support[pair] >= r["support"]


def test_window_funnel_counts_users_once(spark, duck, sf_dir):
    rows = analytics10.window_funnel(spark, sf_dir).collect()
    n_users = duck.execute(
        "SELECT COUNT(DISTINCT user_id) FROM events"
    ).fetchone()[0]
    assert sum(r["n_users"] for r in rows) == n_users
    assert all(0 <= r["max_step"] <= 3 for r in rows)


def test_bootstrap_ci_brackets_mean(spark, sf_dir):
    r = analytics10.bootstrap_mean_ci(spark, sf_dir).collect()[0]
    assert r["n_replicas"] == analytics10._BOOT_B
    assert r["ci_lo"] <= r["ci_hi"]
    # replica means concentrate near the full mean at any SF
    assert r["ci_lo"] < r["mean_centi"] < r["ci_hi"]


def test_stump_ig_nonnegative_and_counts_conserve(spark, sf_dir):
    rows = analytics10.decision_stump_hour(spark, sf_dir).collect()
    assert len(rows) == 23
    n_all = rows[0]["n_left"] + rows[0]["n_right"]
    for r in rows:
        assert r["n_left"] + r["n_right"] == n_all
        assert r["ig_micro"] >= -4  # floored terms may undershoot by <4 ulp
        assert 0 <= r["pos_left"] <= r["n_left"]


def test_ses_backtest_python_recount(spark, duck, sf_dir):
    days = duck.execute(
        """SELECT day, x FROM (
               SELECT CAST(ts AS DATE) AS day,
                      SUM(CAST(round(value * 100, 0) AS BIGINT)) AS x
               FROM events WHERE event_type = 'purchase'
               GROUP BY 1 ORDER BY day DESC LIMIT 30) ORDER BY day"""
    ).fetchall()
    xs = [x for _, x in days]
    level = xs[0]
    errs = []
    for x in xs[1:]:
        errs.append(abs(x - level))
        level = (x + level) / 2.0
    want_mae = sum(errs) / len(errs)
    got = analytics10.ses_backtest(spark, sf_dir).collect()[0]
    assert got["n_fc"] == len(errs)
    assert math.isclose(got["mae_cents"], want_mae, rel_tol=1e-12)


def test_sequential_pairs_are_directed(spark, sf_dir):
    rows = analytics10.sequential_copurchase(spark, sf_dir).collect()
    assert 0 < len(rows) <= analytics10._TOP_K
    for r in rows:
        assert r["a"] != r["b"] and r["n_customers"] >= 1
