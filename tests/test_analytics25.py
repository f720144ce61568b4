"""Oracle + semantics tests for the rank-correlation /
vocabulary-drift / optimizer-audit / sensitivity pack
(queries/analytics25.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics25
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics25.ORACLE))
def test_analytics25_oracle(spark, duck, sf_dir, name):
    df = analytics25.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics25.ORACLE[name])


def test_tau_b_in_range_and_counts_partition(spark, sf_dir):
    r = analytics25.kendall_tau_daily(spark, sf_dir).collect()[0]
    assert -1.0 <= r["tau_b"] <= 1.0
    # concordant + discordant + (pairs tied in x or y) >= all pairs
    assert r["nc"] + r["nd"] <= r["n0"]
    assert r["n0"] > 0


def test_oov_bounded(spark, sf_dir):
    rows = analytics25.oov_vocabulary_drift(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["oov_tokens"] <= r["n_second_tokens"]
        assert 0 <= r["oov_micro"] <= 1_000_000


def test_cardinality_pkfk_joins_exact(spark, sf_dir):
    rows = {r["join_name"]: r for r in
            analytics25.cardinality_estimator_audit(spark, sf_dir).collect()}
    assert set(rows) == {
        "lineitem_orders", "orders_customer", "lineitem_part"
    }
    # PK-FK joins where every FK value exists: estimate == truth
    lo = rows["lineitem_orders"]
    assert lo["true_rows"] == lo["na"]  # every lineitem matches one order
    assert abs(lo["est_over_true"] - 1.0) < 0.01


def test_funnel_sensitivity_monotone(spark, sf_dir):
    rows = analytics25.window_funnel_sensitivity(spark, sf_dir).collect()
    assert [r["window_s"] for r in rows] == [60, 600, 3600, 86400]
    for prev, cur in zip(rows, rows[1:]):
        # wider window can only convert more
        assert cur["n_step2"] >= prev["n_step2"]
        assert cur["n_step3"] >= prev["n_step3"]
        assert cur["n_step1"] == prev["n_step1"]
