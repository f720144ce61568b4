"""Golden oracle tests for the document pack (T04-T08) incl. the
flat ≡ nested dual-plan equivalence."""

import pytest

from bigdatamanagement_spark.queries import mongo
from tests.conftest import assert_matches_oracle, canonicalize


@pytest.mark.parametrize("name", sorted(mongo.QUERIES))
def test_mongo_oracle(spark, duck, sf_dir, name):
    df = mongo.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, mongo.ORACLE[name])


def test_custorders_preserves_customer_count(spark, sf_dir):
    from bigdatamanagement_spark.catalog import load_testdata

    t = load_testdata(spark, sf_dir, tables=("customer",), register=False)
    nested = mongo.custorders(spark, sf_dir)
    assert nested.count() == t["customer"].count()
    # empty arrays, never NULL (SURVEY §5.3 unwind trap)
    assert nested.filter("orders IS NULL").count() == 0


def test_flat_nested_equivalence(spark, sf_dir):
    flat = canonicalize(mongo.top5_customers_flat(spark, sf_dir).toArrow().to_pylist())
    nested = canonicalize(mongo.top5_customers_nested(spark, sf_dir).toArrow().to_pylist())
    assert flat == nested


def test_depth2_inplace_plan_equals_explode_plan(spark, sf_dir):
    """The explode-free nested-aggregate plan (higher-order fold over
    both array levels) must equal the explode plan row-for-row."""
    from bigdatamanagement_spark.queries.mongo import (
        depth2_quantity_by_customer,
        depth2_quantity_by_customer_inplace,
    )

    a = sorted(map(tuple, depth2_quantity_by_customer(spark, sf_dir).collect()))
    b = sorted(map(tuple, depth2_quantity_by_customer_inplace(spark, sf_dir).collect()))
    assert a == b
