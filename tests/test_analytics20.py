"""Oracle + semantics tests for the composite-relational /
exact-interpolation / sequence / finance-calendar pack
(queries/analytics20.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics20
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics20.ORACLE))
def test_analytics20_oracle(spark, duck, sf_dir, name):
    df = analytics20.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics20.ORACLE[name])


def test_rollup_levels_consistent(spark, sf_dir):
    rows = analytics20.snowflake_rollup_report(spark, sf_dir).collect()
    assert rows
    grand = [r for r in rows if r["rollup_level"] == 2]
    assert len(grand) == 1 and grand[0]["region"] == "(all)"
    lvl0 = sum(r["revenue_cents"] for r in rows if r["rollup_level"] == 0)
    # level-0 total can fall short of the grand total only via the
    # HAVING prune; never exceed it
    assert lvl0 <= grand[0]["revenue_cents"]


def test_percentile_cont_python_recount(spark, duck, sf_dir):
    xs = sorted(
        x
        for (x,) in duck.execute(
            "SELECT CAST(round(value * 100, 0) AS BIGINT) FROM events "
            "WHERE event_type = 'purchase'"
        ).fetchall()
    )
    got = {r["p"]: r for r in
           analytics20.percentile_cont_exact(spark, sf_dir).collect()}
    n = len(xs)
    for p in analytics20._PCTS:
        k, r = divmod((n - 1) * p, 100)
        want = xs[k] + r * (xs[min(k + 1, n - 1)] - xs[k]) / 100.0
        assert got[p]["pct_centi"] == want
        assert got[p]["n"] == n


def test_runs_are_positive(spark, sf_dir):
    rows = analytics20.longest_increasing_runs(spark, sf_dir).collect()
    assert 0 < len(rows) <= analytics20._RUN_TOP_K
    for r in rows:
        assert r["run_len"] >= 1
    assert rows[0]["run_len"] >= rows[-1]["run_len"]


def test_recognition_conserves_revenue(spark, duck, sf_dir):
    rows = analytics20.revenue_recognition_schedule(spark, sf_dir).collect()
    total = duck.execute(
        "SELECT SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) FROM orders"
    ).fetchone()[0]
    assert sum(r["recognized_cents"] for r in rows) == total
    n_orders = duck.execute("SELECT COUNT(*) FROM orders").fetchone()[0]
    assert sum(r["n_tranches"] for r in rows) == n_orders * 3
