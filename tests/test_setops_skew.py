"""Oracle tests for the set-op/rollup pack + salted-aggregation equivalence."""

import pyspark.sql.functions as F
import pytest

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.operators.skew import salted_agg, salted_broadcast_left
from bigdatamanagement_spark.queries import setops
from tests.conftest import assert_matches_oracle, canonicalize


@pytest.mark.parametrize("name", sorted(setops.QUERIES))
def test_setops_oracle(spark, duck, sf_dir, name):
    df = setops.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, setops.ORACLE[name])


def test_salted_agg_equals_plain(spark, sf_dir):
    ev = load_testdata(spark, sf_dir, tables=("events",), register=False)["events"]
    plain = ev.groupBy("event_type").agg(
        F.round(F.sum("value"), 2).alias("total"), F.count("*").alias("n")
    )
    salted = salted_agg(
        ev,
        ["event_type"],
        {
            "total": (F.sum("value"), F.round(F.sum(F.col("total")), 2)),
            "n": (F.count("*"), F.sum(F.col("n"))),
        },
        buckets=16,
    )
    assert canonicalize(plain.toArrow().to_pylist()) == canonicalize(
        salted.toArrow().to_pylist()
    )


def test_salted_broadcast_left_equals_plain(spark, sf_dir):
    t = load_testdata(spark, sf_dir, tables=("orders", "customer"), register=False)
    fact = t["orders"].withColumnRenamed("o_custkey", "c_custkey")
    plain = fact.join(t["customer"], "c_custkey").select("o_orderkey", "c_name")
    salted = salted_broadcast_left(fact, t["customer"], "c_custkey", buckets=4).select(
        "o_orderkey", "c_name"
    )
    assert canonicalize(plain.toArrow().to_pylist()) == canonicalize(
        salted.toArrow().to_pylist()
    )
