"""Oracle + semantics tests for the median-polish / Theil /
stochastic-dominance pack (queries/analytics38.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics38
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics38.ORACLE))
def test_analytics38_oracle(spark, duck, sf_dir, name):
    df = analytics38.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics38.ORACLE[name])


def test_median_polish_shrinks_residuals(spark, sf_dir):
    from bigdatamanagement_spark.catalog import load_testdata
    import pyspark.sql.functions as F

    rows = analytics38.median_polish(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 7
    l1 = rows[0]["resid_l1"]
    assert all(r["resid_l1"] == l1 for r in rows)
    # polish never leaves more L1 mass than the raw table holds
    ev = load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]
    total = ev.count()
    assert 0 <= l1 <= total
    assert rows[0]["resid_max"] <= l1


def test_theil_decomposition_adds_up(spark, sf_dir):
    r = analytics38.theil_decomposition(spark, sf_dir).collect()[0]
    assert r["n_customers"] > 0
    assert r["total_theil_micro"] >= 0
    assert r["within_theil_micro"] >= 0
    # between can floor slightly negative; bounded by the floors
    assert r["between_theil_micro"] >= -(r["n_customers"] + 30)
    # additivity up to the documented per-term floors
    assert abs(r["decomposition_gap_micro"]) <= 3 * (
        r["n_customers"] + 30
    )


def test_dominance_verdict_consistency(spark, sf_dir):
    r = analytics38.stochastic_dominance(spark, sf_dir).collect()[0]
    assert r["n_grid"] > 0
    assert r["purchase_dominates"] == (r["viol_p_over_c"] == 0)
    assert r["click_dominates"] == (r["viol_c_over_p"] == 0)
    # the two distributions cannot BOTH strictly dominate
    if r["purchase_dominates"] and r["click_dominates"]:
        # only possible when the CDFs coincide everywhere
        assert r["max_gap_p"] == 0 and r["max_gap_c"] == 0
