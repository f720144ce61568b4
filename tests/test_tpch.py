"""Golden oracle tests for the relational pack (T01-T03)."""

import pytest

from bigdatamanagement_spark.queries import tpch
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(tpch.QUERIES))
def test_tpch_oracle(spark, duck, sf_dir, name):
    df = tpch.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, tpch.ORACLE[name])


def test_t01_limit(spark, sf_dir):
    assert tpch.QUERIES["t01_top10_recent_orders_america"](spark, sf_dir).count() == 10
