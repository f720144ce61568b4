"""Data-quality expectations: oracle parity + non-vacuity + semantics on
a crafted frame where every check kind actually fires."""

from __future__ import annotations

import pyspark.sql.functions as F

from bigdatamanagement_spark.queries import quality as Q
from tests.conftest import assert_matches_oracle


def test_dq_oracle(spark, duck, sf_dir):
    df = Q.dq_expectations_report(spark, sf_dir)
    assert_matches_oracle(df, duck, Q.ORACLE["dq_expectations_report"])


def test_dq_report_is_nonvacuous(spark, sf_dir):
    """The audit must exercise both verdicts on the driver testdata:
    integrity checks pass (clean synthetic FKs/PKs), business-rule range
    checks fail (negative balances, >8% discounts exist)."""
    rows = {r.check_id: r for r in Q.dq_expectations_report(spark, sf_dir).collect()}
    assert rows["fk_lineitem_orderkey"].status == "pass"
    assert rows["unique_orders_pk"].status == "pass"
    assert rows["range_c_acctbal_nonneg"].status == "fail"
    assert rows["range_l_discount_max8pct"].violations > 0
    assert len(rows) == len(Q.CHECKS)


def test_expectations_kinds_fire_on_crafted_data(spark):
    """Each check kind counts exactly the violations planted: 2 dup-key
    rows beyond the first, 1 orphan FK (plus 1 NULL child key = 2 orphans,
    matching NOT EXISTS), 1 null, 1 out-of-range."""
    from bigdatamanagement_spark.operators.expectations import expectations_report

    child = spark.createDataFrame(
        [(1, 10, 5.0), (1, 10, None), (2, 99, -3.0), (2, None, 1.0), (1, 20, 2.0)],
        "id int, parent_id int, v double",
    )
    parent = spark.createDataFrame([(10,), (20,)], "pid int")
    rep = expectations_report(
        {"child": child, "parent": parent},
        [
            ("uniq_id", "child", "unique", ["id"]),
            ("fk_parent", "child", "fk", ("parent_id", "parent", "pid")),
            ("notnull_v", "child", "row", "v IS NULL"),
            ("range_v", "child", "row", "v < 0"),
        ],
    )
    got = {r.check_id: (r.violations, r.status) for r in rep.collect()}
    assert got == {
        "uniq_id": (3, "fail"),  # 5 rows, 2 distinct ids
        "fk_parent": (2, "fail"),  # parent_id=99 and parent_id=NULL
        "notnull_v": (1, "fail"),
        "range_v": (1, "fail"),
    }


def test_row_checks_share_one_scan(spark, sf_dir):
    """All row+unique checks of a table fold into one aggregate: the
    lineitem branch of the plan contains exactly one scan of lineitem."""
    from bigdatamanagement_spark.catalog import load_testdata
    from bigdatamanagement_spark.operators.expectations import expectations_report

    tables = load_testdata(spark, sf_dir, tables=("lineitem",), register=False)
    rep = expectations_report(
        tables,
        [
            ("a", "lineitem", "row", "l_quantity IS NULL"),
            ("b", "lineitem", "row", "l_discount > 0.08"),
            ("c", "lineitem", "unique", ["l_orderkey", "l_linenumber"]),
        ],
    )
    plan = rep._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Relation") == 1, plan
