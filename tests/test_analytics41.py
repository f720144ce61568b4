"""Oracle + semantics tests for the JT / Youden / profile-similarity
pack (queries/analytics41.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics41
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics41.ORACLE))
def test_analytics41_oracle(spark, duck, sf_dir, name):
    df = analytics41.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics41.ORACLE[name])


def test_jt_u_bounds(spark, sf_dir):
    r = analytics41.jonckheere_terpstra(spark, sf_dir).collect()[0]
    group_total = sum(r[f"n_{b}"] for b in analytics41._JT_BUCKETS)
    assert group_total == r["nn"] > 0
    # 0 <= U <= sum over pairs of n_i * n_j
    max_u = sum(
        r[f"n_{i}"] * r[f"n_{j}"] for i, j in analytics41._JT_PAIRS
    )
    assert 0 <= r["two_u"] <= 2 * max_u


def test_youden_beats_trivial_cutoffs(spark, sf_dir):
    r = analytics41.youden_optimal_cutoff(spark, sf_dir).collect()[0]
    assert 0 < r["pos"] and 0 < r["neg"]
    assert 0 <= r["tp"] <= r["pos"]
    assert 0 <= r["fp"] <= r["neg"]
    # J of the optimum is >= 0 (the all-positive cutoff achieves 0)
    assert r["youden_j"] >= -1e-12


def test_profile_similarity_bounds(spark, sf_dir):
    rows = analytics41.type_profile_similarity(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 10
    for r in rows:
        assert r["type_a"] < r["type_b"]
        # non-negative count vectors => cosine in [0, 1]
        assert -1e-9 <= r["profile_cosine"] <= 1.0 + 1e-9
