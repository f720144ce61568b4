"""Data-quality pack: the declared-but-never-verified constraints of the
reference's DDL (PK/FK/NOT NULL at `Assignment 6/src/AmazonRedshift.java:
119-206`, `Assignment 3/.../SQLonRDS.java:116-137`) plus business-rule
range/freshness checks, evaluated as counted expectations
(operators/expectations.py). The DuckDB oracle is generated from the SAME
check list, so the two engines can never drift on which checks exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.operators.expectations import expectations_report

CHECKS = [
    ("accepted_o_orderstatus", "orders", "row", "o_orderstatus NOT IN ('O', 'F', 'P')"),
    ("fk_customer_nationkey", "customer", "fk", ("c_nationkey", "nation", "n_nationkey")),
    ("fk_lineitem_orderkey", "lineitem", "fk", ("l_orderkey", "orders", "o_orderkey")),
    ("fk_orders_custkey", "orders", "fk", ("o_custkey", "customer", "c_custkey")),
    ("notnull_l_quantity", "lineitem", "row", "l_quantity IS NULL"),
    ("range_c_acctbal_nonneg", "customer", "row", "c_acctbal < 0"),
    ("range_l_discount_max8pct", "lineitem", "row", "l_discount < 0 OR l_discount > 0.08"),
    ("range_l_quantity_positive", "lineitem", "row", "l_quantity <= 0"),
    ("stale_orders_pre1996", "orders", "row",
     "o_orderdate < TIMESTAMP '1996-01-01 00:00:00'"),
    ("unique_orders_pk", "orders", "unique", ["o_orderkey"]),
    ("unique_part_pk", "part", "unique", ["p_partkey"]),
]

_TABLES = ("orders", "lineitem", "customer", "part", "nation")


def dq_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full constraint audit of the star schema: one row per check with
    its violation count and pass/fail status. Row+unique checks cost one
    scan per table (conditional aggregate); each FK costs one anti-join."""
    tables = load_testdata(spark, sf_dir, tables=_TABLES, register=False)
    return expectations_report(tables, CHECKS).orderBy("check_id")


def _oracle_one(cid: str, tbl: str, kind: str, arg) -> str:
    if kind == "row":
        v = f"SUM(CASE WHEN {arg} THEN 1 ELSE 0 END)"
        frm = tbl
    elif kind == "unique":
        keys = ", ".join(arg)
        v = f"COUNT(*) - COUNT(DISTINCT {keys})"
        frm = tbl
    else:  # fk
        child_col, parent_tbl, parent_col = arg
        v = "COUNT(*)"
        frm = (
            f"{tbl} c WHERE NOT EXISTS (SELECT 1 FROM {parent_tbl} p "
            f"WHERE p.{parent_col} = c.{child_col})"
        )
    return (
        f"SELECT '{cid}' AS check_id, '{tbl}' AS tbl, "
        f"CAST(COALESCE({v}, 0) AS BIGINT) AS violations FROM {frm}"
    )


_UNION = "\nUNION ALL\n".join(_oracle_one(*c) for c in CHECKS)

QUERIES = {"dq_expectations_report": dq_expectations_report}

ORACLE = {
    "dq_expectations_report": f"""
        SELECT check_id, tbl, violations,
               CASE WHEN violations = 0 THEN 'pass' ELSE 'fail' END AS status
        FROM ({_UNION})
        ORDER BY check_id
    """,
}
