"""Oracle + semantics tests for the modularity / transitivity /
winsorization-sweep / mix-entropy pack (queries/analytics37.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics37
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics37.ORACLE))
def test_analytics37_oracle(spark, duck, sf_dir, name):
    df = analytics37.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics37.ORACLE[name])


def test_modularity_bounds(spark, sf_dir):
    r = analytics37.modularity_score(spark, sf_dir).collect()[0]
    assert r["m"] > 0
    assert 0 <= r["e_in"] <= r["m"]
    # Q in [-1/2, 1) by construction
    assert -0.5 - 1e-9 <= r["modularity_q"] < 1.0
    assert r["n_communities"] >= 1


def test_transitivity_in_unit_interval(spark, sf_dir):
    r = analytics37.graph_transitivity(spark, sf_dir).collect()[0]
    assert 0.0 <= r["transitivity"] <= 1.0
    assert r["n_wedges"] >= r["n_triangles"] * 3 or r["n_wedges"] == 0
    assert r["n_vertices"] > 0 and r["n_edges"] > 0


def test_winsorization_monotone_fences(spark, sf_dir):
    rows = {
        r["level_pct"]: r
        for r in analytics37.winsorization_sweep(spark, sf_dir).collect()
    }
    assert set(rows) == {1, 5, 10}
    # deeper trimming narrows the fences
    assert rows[1]["lo_cents"] <= rows[5]["lo_cents"] <= rows[10]["lo_cents"]
    assert rows[1]["hi_cents"] >= rows[5]["hi_cents"] >= rows[10]["hi_cents"]
    for r in rows.values():
        assert r["lo_cents"] <= r["wins_mean_cents"] <= r["hi_cents"]


def test_entropy_trend_shape(spark, sf_dir):
    r = analytics37.brand_mix_entropy_trend(spark, sf_dir).collect()[0]
    assert r["nw"] >= 2
    assert r["mean_h_micro"] >= 0
    assert r["first_week_h"] >= 0 and r["last_week_h"] >= 0
