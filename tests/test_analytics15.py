"""Oracle + semantics tests for the in-engine ML-training / finance /
MCDM pack (queries/analytics15.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics15
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics15.ORACLE))
def test_analytics15_oracle(spark, duck, sf_dir, name):
    df = analytics15.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics15.ORACLE[name])


def test_gd_python_recount(spark, duck, sf_dir):
    """Re-run the 3 integer GD epochs in plain python over the raw
    rows and demand bit-identical weights."""
    rows = duck.execute(
        "SELECT CASE WHEN event_type = 'purchase' THEN 1000000 ELSE 0 END, "
        "hour(ts), CAST(floor(value / 100) AS BIGINT) FROM events"
    ).fetchall()

    def tdiv(a, b):
        q = abs(a) // b
        return -q if a < 0 else q

    w0 = w1 = w2 = 0
    for _ in range(analytics15._GD_EPOCHS):
        g0 = g1 = g2 = 0
        for y, x1, x2 in rows:
            z = w0 + w1 * x1 + w2 * x2
            sig = min(max(500000 + tdiv(z, 4), 0), 1000000)
            g0 += sig - y
            g1 += (sig - y) * x1
            g2 += (sig - y) * x2
        n = len(rows)
        w0 -= tdiv(tdiv(g0, n), 16)
        w1 -= tdiv(tdiv(g1, n), 16)
        w2 -= tdiv(tdiv(g2, n), 16)
    got = analytics15.logistic_gd_weights(spark, sf_dir).collect()[-1]
    assert (got["w0"], got["w1"], got["w2"]) == (w0, w1, w2)


def test_gd_brier_improves_over_null(spark, sf_dir):
    rows = analytics15.logistic_gd_weights(spark, sf_dir).collect()
    assert len(rows) == analytics15._GD_EPOCHS
    for r in rows:
        assert r["brier_micro"] >= 0


def test_gains_table_shape(spark, sf_dir):
    rows = analytics15.logistic_gains_table(spark, sf_dir).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    assert abs(rows[-1]["capture_rate"] - 1.0) < 1e-12
    total = sum(r["n"] for r in rows)
    assert rows[-1]["cum_positives"] == sum(r["positives"] for r in rows)
    for prev, cur in zip(rows, rows[1:]):
        assert cur["cum_positives"] >= prev["cum_positives"]
    assert total > 0


def test_npv_below_undiscounted(spark, duck, sf_dir):
    rows = analytics15.npv_customer_ltv(spark, sf_dir).collect()
    raw = dict(
        duck.execute(
            """SELECT c_mktsegment,
                   SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
               FROM orders JOIN customer ON o_custkey = c_custkey
               GROUP BY 1"""
        ).fetchall()
    )
    assert rows
    for r in rows:
        assert 0 < r["npv_sum_centi"] <= raw[r["c_mktsegment"]]


def test_topsis_closeness_in_unit_interval(spark, sf_dir):
    rows = analytics15.topsis_part_ranking(spark, sf_dir).collect()
    assert 0 < len(rows) <= analytics15._TOPSIS_TOP_K
    for r in rows:
        assert 0.0 <= r["closeness"] <= 1.0


def test_grubbs_positive(spark, sf_dir):
    rows = analytics15.grubbs_outlier(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["g_stat"] > 0 and r["mn"] <= r["mx"]
