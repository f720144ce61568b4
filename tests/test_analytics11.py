"""Oracle + semantics tests for the weighted-graph /
correlation-structure / nonparametric pack (queries/analytics11.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics11
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics11.ORACLE))
def test_analytics11_oracle(spark, duck, sf_dir, name):
    df = analytics11.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics11.ORACLE[name])


def test_bellman_ford_monotone(spark, sf_dir):
    rows = {
        r["round"]: r
        for r in analytics11.bellman_ford_copurchase(spark, sf_dir).collect()
    }
    assert set(rows) == {1, 2, 3}
    for r in (2, 3):
        # relaxing can only reach more vertices and never lengthen paths
        assert rows[r]["n_reached"] >= rows[r - 1]["n_reached"]
    assert rows[1]["n_reached"] >= 2  # src + at least one neighbor


def test_corr_matrix_bounds_and_symmetry(spark, sf_dir):
    rows = analytics11.corr_leadlag_matrix(spark, sf_dir).collect()
    lag0 = [(r["type_a"], r["type_b"]) for r in rows if r["lag"] == 0]
    lag1 = [(r["type_a"], r["type_b"]) for r in rows if r["lag"] == 1]
    assert len(lag0) == 10 and len(lag1) == 20  # C(5,2) and P(5,2)
    for r in rows:
        assert abs(r["r"]) <= 1.0 + 1e-12
        assert r["n"] > 2


def test_anova_against_python(spark, duck, sf_dir):
    days = duck.execute(
        "SELECT isodow(CAST(ts AS DATE)) AS g, COUNT(*) FROM events "
        "GROUP BY CAST(ts AS DATE)"
    ).fetchall()
    groups: dict[int, list[int]] = {}
    for g, x in days:
        groups.setdefault(g, []).append(x)
    n = sum(len(v) for v in groups.values())
    t = sum(sum(v) for v in groups.values())
    ssq = sum(x * x for v in groups.values() for x in v)
    between = sum(sum(v) ** 2 / len(v) for v in groups.values()) - t**2 / n
    within = ssq - sum(sum(v) ** 2 / len(v) for v in groups.values())
    want_f = (between / 6.0) / (within / (n - 7))
    got = analytics11.weekday_anova(spark, sf_dir).collect()[0]
    assert got["n"] == n and got["t"] == t and got["ssq"] == ssq
    assert abs(got["f_stat"] - want_f) < 1e-9 * max(1.0, abs(want_f))
    assert 0.0 <= got["eta_sq"] <= 1.0


def test_runs_test_counts(spark, sf_dir):
    r = analytics11.revenue_runs_test(spark, sf_dir).collect()[0]
    assert r["n0"] >= 1 and r["n1"] >= 1
    assert 1 <= r["r"] <= r["n0"] + r["n1"]


def test_qq_deciles_monotone(spark, sf_dir):
    rows = analytics11.qq_decile_drift(spark, sf_dir).collect()
    assert [r["decile"] for r in rows] == list(range(1, 10))
    for prev, cur in zip(rows, rows[1:]):
        assert cur["v_first_centi"] >= prev["v_first_centi"]
        assert cur["v_second_centi"] >= prev["v_second_centi"]
