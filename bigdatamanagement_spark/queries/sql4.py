"""Spark 4 SQL-surface pack: the engine's coverage of the NEW SQL
capabilities Spark 4 added — VARIANT semi-structured values, SQL-body
scalar UDFs (CREATE FUNCTION … RETURN), and the pipe (|>) query
syntax — each exercised by an oracle-checked query so the surfaces are
proven, not just available.

Reference anchors (SURVEY §2/§3): the engine's two entry surfaces are
`engine.sql` and DataFrame builders (§3.4); these queries extend the
SQL surface to its Spark-4 edge. F-17 (JSON prop access over the
driver `events` table) gets its VARIANT-native form here, next to the
get_json_object form used across T17/T18.

Scale notes (100 TB):
- VARIANT parses once per row into a binary-encoded value; repeated
  field reads are then O(field) without re-parsing the JSON text —
  the right shape when several props are read per row (the
  get_json_object form re-parses per call).
- SQL UDFs inline into the plan at analysis time (they are macros,
  not black boxes) — predicates/expressions stay visible to Catalyst,
  so pushdown and codegen are unaffected, unlike Python UDFs.
- pipe syntax is surface-only: it lowers to the same logical plan as
  the nested-SELECT form (asserted by the oracle equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigdatamanagement_spark.catalog import load_testdata


def variant_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL4-a — F-17 in VARIANT form: parse the events `props` JSON
    into a VARIANT once, then per event_type aggregate the extracted
    `k` field (count, exact sum, min/max). Equivalent to the
    get_json_object form but with parse-once semantics."""
    ev = load_testdata(spark, sf_dir, tables=("events",), register=False)["events"]
    ev.createOrReplaceTempView("sql4_events")
    return spark.sql(
        """
        WITH v AS (
            SELECT event_type,
                   variant_get(parse_json(props), '$.k', 'long') AS k
            FROM sql4_events
        )
        SELECT event_type,
               count(k) AS n_with_k,
               sum(k) AS k_sum,
               min(k) AS k_min,
               max(k) AS k_max
        FROM v GROUP BY event_type ORDER BY event_type
        """
    )


def sql_udf_price_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL4-b — SQL-body scalar UDF: a tiering function declared with
    CREATE FUNCTION … RETURN classifies order totals; the rollup uses
    it like a built-in. The function body is a macro inlined by the
    analyzer — the CASE stays visible to Catalyst (unlike a Python
    UDF, which would be an opaque batch-eval node)."""
    o = load_testdata(spark, sf_dir, tables=("orders",), register=False)["orders"]
    o.createOrReplaceTempView("sql4_orders")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION price_tier(p DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN p < 50000 THEN 'small'
                    WHEN p < 150000 THEN 'mid'
                    ELSE 'large' END
        """
    )
    return spark.sql(
        """
        SELECT price_tier(o_totalprice) AS tier,
               count(*) AS n_orders,
               sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS total_cents
        FROM sql4_orders GROUP BY 1 ORDER BY tier
        """
    )


def pipe_syntax_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL4-c — T03's shape (lineitem ⋈ orders, half-open date range,
    count by priority — `AmazonRedshift.java:522-535`) re-expressed in
    Spark 4 pipe syntax. The |> chain lowers to the identical logical
    plan as the nested form; the oracle equality proves the lowering
    preserves semantics."""
    t = load_testdata(spark, sf_dir, tables=("lineitem", "orders"), register=False)
    t["lineitem"].createOrReplaceTempView("sql4_lineitem")
    t["orders"].createOrReplaceTempView("sql4_orders2")
    return spark.sql(
        """
        FROM sql4_orders2
        |> WHERE o_orderdate >= TIMESTAMP '1997-04-01 00:00:00'
             AND o_orderdate < TIMESTAMP '2003-04-01 00:00:00'
        |> JOIN sql4_lineitem ON o_orderkey = l_orderkey
        |> AGGREGATE count(*) AS n_items GROUP BY o_orderpriority
        |> ORDER BY o_orderpriority
        """
    )


QUERIES = {
    "sql4_variant_props_rollup": variant_props_rollup,
    "sql4_udf_price_tiers": sql_udf_price_tiers,
    "sql4_pipe_priority_rollup": pipe_syntax_priority_rollup,
}

ORACLE = {
    "sql4_variant_props_rollup": """
        WITH v AS (
            SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
        )
        SELECT event_type,
               count(k) AS n_with_k,
               CAST(sum(k) AS BIGINT) AS k_sum,
               CAST(min(k) AS BIGINT) AS k_min,
               CAST(max(k) AS BIGINT) AS k_max
        FROM v GROUP BY event_type ORDER BY event_type
    """,
    "sql4_udf_price_tiers": """
        SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                    WHEN o_totalprice < 150000 THEN 'mid'
                    ELSE 'large' END AS tier,
               count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
                   AS total_cents
        FROM orders GROUP BY 1 ORDER BY tier
    """,
    "sql4_pipe_priority_rollup": """
        SELECT o.o_orderpriority, count(*) AS n_items
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderdate >= TIMESTAMP '1997-04-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '2003-04-01 00:00:00'
        GROUP BY 1 ORDER BY o.o_orderpriority
    """,
}
