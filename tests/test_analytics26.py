"""Oracle + semantics tests for the clustering-coefficient /
anomaly-ensemble / recommender-eval / circular-statistics pack
(queries/analytics26.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics26
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics26.ORACLE))
def test_analytics26_oracle(spark, duck, sf_dir, name):
    df = analytics26.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics26.ORACLE[name])


def test_clustering_coefficients_bounded(spark, sf_dir):
    rows = analytics26.local_clustering(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["cc_micro"] <= 1_000_000
        assert r["deg"] >= 4
        # tri <= deg choose 2
        assert r["tri"] <= r["deg"] * (r["deg"] - 1) // 2


def test_ensemble_requires_majority(spark, sf_dir):
    rows = analytics26.anomaly_ensemble_consensus(spark, sf_dir).collect()
    for r in rows:
        n = int(r["f_z"]) + int(r["f_mad"]) + int(r["f_iqr"])
        assert n == r["n_methods"] >= 2


def test_hitrate_bounded(spark, sf_dir):
    r = analytics26.popularity_hitrate_at_k(spark, sf_dir).collect()[0]
    assert 0 < r["n_hit"] <= r["n_test"]
    assert 0 < r["hitrate_micro"] <= 1_000_000


def test_circular_stats_sane(spark, sf_dir):
    r = analytics26.circular_hour_stats(spark, sf_dir).collect()[0]
    assert 0.0 <= r["resultant_r"] <= 1.0
    assert 0.0 <= r["mean_hour"] < 24.0
    assert r["n"] > 0
