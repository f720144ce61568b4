"""Oracle + semantics tests for the complex-type surface pack
(queries/analytics43.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics43
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics43.ORACLE))
def test_analytics43_oracle(spark, duck, sf_dir, name):
    df = analytics43.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics43.ORACLE[name])


def test_map_surface_filter_semantics(spark, sf_dir):
    rows = analytics43.map_column_surface(spark, sf_dir).collect()
    for r in rows:
        # every kept doubled value is >= 6 and even
        assert r["sum_doubled"] >= 6 * r["n_users_kept"]
        assert r["sum_doubled"] % 2 == 0


def test_array_hof_conservation(spark, sf_dir):
    r = analytics43.array_hof_surface(spark, sf_dir).collect()[0]
    assert r["n_users"] > 0
    # aggregate() total equals the plain SUM for EVERY user
    assert r["conservation_ok"] == r["n_users"]
    assert 0 <= r["total_increases"] <= r["total_days"]
    assert 0 <= r["total_above_mean"] <= r["total_days"]
