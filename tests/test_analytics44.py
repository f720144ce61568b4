"""Oracle + semantics tests for the embedding representation-health
pack (queries/analytics44.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics44
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics44.ORACLE))
def test_analytics44_oracle(spark, duck, sf_dir, name):
    df = analytics44.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics44.ORACLE[name])


def test_anisotropy_bounds(spark, sf_dir):
    r = analytics44.embedding_anisotropy(spark, sf_dir).collect()[0]
    assert r["n"] > 1 and r["qq"] > 0
    # mean pairwise cosine-like ratio lives in [-1/(n-1), 1]
    assert -1.0 <= r["anisotropy"] <= 1.0 + 1e-9


def test_fisher_nonnegative(spark, sf_dir):
    r = analytics44.fisher_separability(spark, sf_dir).collect()[0]
    assert r["b_sum"] >= 0
    assert r["w_sum"] > 0
    assert r["fisher_ratio"] >= 0


def test_purity_beats_chance_or_not_but_bounded(spark, sf_dir):
    r = analytics44.centroid_purity(spark, sf_dir).collect()[0]
    assert r["n_vectors"] > 0
    assert 1 <= r["n_labels"] <= r["n_vectors"]
    assert 0 <= r["pure"] <= r["n_vectors"]
    assert 0 <= r["purity_micro"] <= 1_000_000
