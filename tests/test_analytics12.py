"""Oracle + semantics tests for the Markov-attribution /
econometrics / text-metrics pack (queries/analytics12.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics12
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics12.ORACLE))
def test_analytics12_oracle(spark, duck, sf_dir, name):
    df = analytics12.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics12.ORACLE[name])


def test_markov_removal_effects_positive_and_shares_sum(spark, sf_dir):
    rows = analytics12.markov_attribution(spark, sf_dir).collect()
    assert {r["channel"] for r in rows} == set(analytics12._TOUCHES)
    base = rows[0]["base_micro"]
    for r in rows:
        assert r["base_micro"] == base
        # removing a channel can only lose conversion mass
        assert 0 <= r["removal_micro"] <= base
        assert 0 <= r["conv_micro"] <= base
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-9


def test_markov_journey_edges_conserve_users(spark, duck, sf_dir):
    """Every user contributes exactly one start edge."""
    edges = analytics12._journey_edges(
        analytics12._events(spark, sf_dir)
    ).collect()
    n_start = sum(r["c"] for r in edges if r["src"] == "start")
    n_users = duck.execute(
        "SELECT COUNT(DISTINCT user_id) FROM events"
    ).fetchone()[0]
    assert n_start == n_users
    # every edge endpoint is a known state
    states = set(analytics12._TOUCHES) | {"start", "conv", "null"}
    for r in edges:
        assert r["src"] in states and r["dst"] in states


def test_elasticity_is_finite(spark, sf_dir):
    rows = analytics12.price_elasticity(spark, sf_dir).collect()
    assert len(rows) >= 5
    for r in rows:
        assert r["n"] > 10
        assert abs(r["elasticity"]) < 100.0


def test_simpson_pooled_consistency(spark, sf_dir):
    rows = analytics12.simpson_paradox_detector(spark, sf_dir).collect()
    pooled = {r["pooled_num"] for r in rows}
    assert len(pooled) == 1  # same broadcast pooled row everywhere
    for r in rows:
        assert r["reversed"] == (
            (r["slope_num"] > 0) != (r["pooled_num"] > 0)
            and r["slope_num"] != 0
            and r["pooled_num"] != 0
        ) or (r["slope_num"] == 0 or r["pooled_num"] == 0) and not r["reversed"]


def test_flesch_counts_positive(spark, sf_dir):
    rows = analytics12.flesch_by_source(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["words"] > 0 and r["sentences"] >= r["n_docs"] * 0
        assert r["syllables"] > 0
        assert -300.0 < r["flesch"] < 206.836
