"""Oracle + semantics tests for the harmonic-centrality / TextRank /
Shapley / Gini-ranking pack (queries/analytics29.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics29
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics29.ORACLE))
def test_analytics29_oracle(spark, duck, sf_dir, name):
    df = analytics29.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics29.ORACLE[name])


def test_harmonic_counts_and_bounds(spark, sf_dir):
    rows = analytics29.harmonic_centrality(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n1"] > 0
        assert (
            r["harmonic_micro"]
            == r["n1"] * 1_000_000 + r["n2"] * 500_000 + r["n3"] * 333_333
        )
    scores = [r["harmonic_micro"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_textrank_mass_and_order(spark, sf_dir):
    rows = analytics29.textrank_keywords(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # every score >= the teleport base; flooring only loses mass
        assert r["score_micro"] >= analytics29._TR_BASE
    scores = [r["score_micro"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_shapley_efficiency_up_to_floors(spark, sf_dir):
    rows = analytics29.shapley_attribution(spark, sf_dir).collect()
    assert len(rows) == 4
    vfull = rows[0]["converted_reachable"]
    total = sum(r["phi_micro"] for r in rows)
    # efficiency: Σ phi = v(full) exactly in rational arithmetic; the
    # 1/12 -> 83333 floor loses at most 2 micro per marginal term
    # (16 terms x 4 channels), plus nothing else
    assert vfull > 0
    assert abs(total - vfull * 1_000_000) <= 4 * 16 * 2 * max(1, vfull)
    for r in rows:
        # monotone v => non-negative marginals => non-negative credit
        assert r["phi_micro"] >= 0


def test_gini_gain_nonnegative_for_real_split(spark, sf_dir):
    rows = analytics29.gini_feature_ranking(spark, sf_dir).collect()
    assert len(rows) == len(analytics29._GINI_FEATURES)
    gains = [r["gain_micro"] for r in rows]
    assert gains == sorted(gains, reverse=True)
    for r in rows:
        assert r["n_branches"] >= 1
        # splitting never increases Gini impurity (up to the documented
        # per-branch floors: each branch floors away < 1 count unit,
        # scaled by 2e6/n)
        slack = (2_000_000 * r["n_branches"])
        assert r["gain_micro"] >= -slack
