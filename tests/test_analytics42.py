"""Oracle + semantics tests for the distribution-distance pack
(queries/analytics42.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics42
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics42.ORACLE))
def test_analytics42_oracle(spark, duck, sf_dir, name):
    df = analytics42.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics42.ORACLE[name])


def test_wasserstein_nonnegative_and_bounded(spark, sf_dir):
    r = analytics42.wasserstein_distance(spark, sf_dir).collect()[0]
    assert r["n_gaps"] > 0
    assert r["w1_dollars"] >= 0
    # W1 between distributions on [0, ~1000] dollars is bounded by the
    # range
    assert r["w1_dollars"] <= 2000


def test_cvm_nonnegative(spark, sf_dir):
    r = analytics42.cramer_von_mises(spark, sf_dir).collect()[0]
    assert r["cvm_sum"] >= 0
    assert r["cvm_t"] >= 0


def test_energy_nonnegative_up_to_floors(spark, sf_dir):
    r = analytics42.energy_distance(spark, sf_dir).collect()[0]
    assert r["exy"] >= 0 and r["exx"] >= 0 and r["eyy"] >= 0
    # energy distance is >= 0 in exact arithmetic; the three
    # independent micro floors can cost a few cents at most
    assert r["energy_dollars"] >= -0.1
