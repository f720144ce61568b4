"""Oracle + plan tests for the Spark 4 SQL-surface pack (VARIANT,
SQL-body UDFs, pipe syntax)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import sql4
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(sql4.ORACLE))
def test_sql4_oracle(spark, duck, sf_dir, name):
    df = sql4.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, sql4.ORACLE[name])


def test_sql_udf_inlines_into_plan(spark, sf_dir):
    """The SQL UDF must be a macro: no Python eval node, and the CASE
    literal thresholds visible in the optimized plan."""
    df = sql4.sql_udf_price_tiers(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "50000" in plan and "150000" in plan  # body inlined
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in executed


def test_pipe_form_plans_like_nested_form(spark, sf_dir):
    """|> lowering must produce the same aggregate result as the
    classic nested SELECT (semantic equivalence beyond the oracle)."""
    import pyspark.sql.functions as F
    from bigdatamanagement_spark.catalog import load_testdata

    piped = {
        (r["o_orderpriority"], r["n_items"])
        for r in sql4.pipe_syntax_priority_rollup(spark, sf_dir).collect()
    }
    t = load_testdata(spark, sf_dir, tables=("lineitem", "orders"), register=False)
    classic = {
        (r["o_orderpriority"], r["n"])
        for r in t["orders"]
        .filter(
            (F.col("o_orderdate") >= "1997-04-01")
            & (F.col("o_orderdate") < "2003-04-01")
        )
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert piped == classic
