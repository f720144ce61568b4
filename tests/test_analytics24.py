"""Oracle + semantics tests for the supply-risk / shrinkage /
residual-diagnostics / lexical pack (queries/analytics24.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics24
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics24.ORACLE))
def test_analytics24_oracle(spark, duck, sf_dir, name):
    df = analytics24.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics24.ORACLE[name])


def test_supplier_hhi_bounds(spark, sf_dir):
    rows = analytics24.supplier_concentration_risk(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # HHI in milli^2: single-source = 1000^2
        assert r["hhi_micro"] <= 1_000_000
        assert r["hhi_micro"] * r["n_suppliers"] >= 900_000  # >= 1/n bound-ish
        assert r["q_total"] >= 50


def test_eb_shrinkage_pulls_toward_pool(spark, sf_dir):
    rows = analytics24.eb_shrunk_conversion(spark, sf_dir).collect()
    assert rows
    sx = sum(r["x"] for r in rows)
    sn = sum(r["n"] for r in rows)
    p0 = sx / sn
    for r in rows:
        lo, hi = sorted((r["raw_rate"], p0))
        assert lo - 1e-12 <= r["shrunk_rate"] <= hi + 1e-12
        assert r["prior_strength"] >= 1.0


def test_residual_cells_are_extreme(spark, sf_dir):
    rows = analytics24.pearson_residual_cells(spark, sf_dir).collect()
    assert len(rows) == 10
    for prev, cur in zip(rows, rows[1:]):
        assert cur["abs_residual"] <= prev["abs_residual"] + 1e-12
    for r in rows:
        assert 0 <= r["h"] <= 23


def test_yule_k_positive_and_length_free(spark, sf_dir):
    rows = analytics24.yule_k_by_source(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["yule_k"] > 0
        assert r["vocab"] <= r["n_tok"]
