"""Relational pack: the reference's Redshift TPC-H queries (T01-T03).

Reference: Assignment 6/src/AmazonRedshift.java:465-535 (query1-query3).
Re-expressed as Spark DataFrame plans; Catalyst handles pushdown, join
ordering, and broadcast selection.

Scale notes (100 TB):
- region/nation are tiny dims -> explicit broadcast(), so the 4-way
  snowflake join in T01/T02 shuffles only on the orders<->customer edge.
- T01 is a global top-k: Spark plans orderBy+limit as
  TakeOrderedAndProject (per-partition heap + driver merge of 10 rows),
  never a full sort.
- T03 filters orders on the date range BEFORE the join (Catalyst pushes
  the predicate into the parquet scan: row-group min/max pruning), then
  aggregates per priority with map-side partial aggregation.
- Determinism shims (SURVEY §5.3): tiebreak keys appended to every
  LIMIT-truncated ordering, mirrored in the oracle SQL.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bigdatamanagement_spark.catalog import load_testdata


def _t(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return load_testdata(
        spark,
        sf_dir,
        tables=("region", "nation", "customer", "orders", "lineitem"),
        register=False,
    )


def top10_recent_orders_america(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T01 — top-10 most recent orders for customers in AMERICA.

    Reference: AmazonRedshift.java:465-479 (query1): 4-table snowflake
    join orders⋈customer⋈nation⋈region, region filter, ORDER BY
    o_orderdate DESC LIMIT 10. Tiebreak o_orderkey DESC appended for
    deterministic hashing.
    """
    t = _t(spark, sf_dir)
    dim = (
        t["customer"]
        .join(F.broadcast(t["nation"]), t["customer"].c_nationkey == t["nation"].n_nationkey)
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "AMERICA")
        .select("c_custkey")
    )
    return (
        t["orders"]
        .join(dim, t["orders"].o_custkey == dim.c_custkey)
        .select(
            "o_orderkey",
            "o_totalprice",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
        )
        .orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .limit(10)
    )


def urgent_spend_largest_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T02 — total urgent non-failed spend per customer, largest market
    segment, outside EUROPE.

    Reference: AmazonRedshift.java:489-513 (query2): argmax segment via
    GROUP BY/ORDER BY count DESC/LIMIT 1 scalar subquery, then 4-way
    join + grouped SUM. The 1-row largest-segment result is broadcast
    (never a shuffle); segment-count tie broken alphabetically.
    """
    t = _t(spark, sf_dir)
    largest = (
        t["customer"]
        .groupBy("c_mktsegment")
        .count()
        .orderBy(F.desc("count"), F.asc("c_mktsegment"))
        .limit(1)
        .select("c_mktsegment")
    )
    cust = (
        t["customer"]
        .join(F.broadcast(largest), "c_mktsegment")
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") != "EUROPE")
        .select("c_custkey")
    )
    return (
        t["orders"]
        .filter((F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") != "F"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .groupBy("c_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spent"))
        .orderBy(F.desc("total_spent"), F.asc("c_custkey"))
    )


def lineitem_count_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T03 — lineitem count by order priority, six years from 1997-04-01.

    Reference: AmazonRedshift.java:522-535 (query3): lineitem⋈orders with
    half-open date range, grouped COUNT(l_linenumber), ordered by
    priority. Date filter is pushed to the orders parquet scan; the
    filtered orders side is small enough for AQE to broadcast at any SF
    (date filter selects a bounded slice), so the big lineitem table
    never shuffles.
    """
    t = _t(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-04-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2003-04-01").cast("timestamp"))
    )
    return (
        t["lineitem"]
        .join(orders, t["lineitem"].l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("l_linenumber").alias("lineitem_count"))
        .orderBy("o_orderpriority")
    )


def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation of customers: quartile scores (1 = best) for
    Recency (latest order), Frequency (order count), Monetary (lifetime
    spend in exact cents), concatenated into a segment label — the
    classic CRM cohort operator.

    The three exact global ranks come from operators/rank.py
    global_row_number (range-repartition + per-partition counts +
    within-partition row_number), NOT a one-partition Window.orderBy —
    the rank is exact at any scale with nothing data-sized on the
    driver. Ties (same order date, count, or spend) break on custkey,
    so ranks are deterministic and the DuckDB row_number oracle matches
    exactly. Bucketing uses 1 + floor((rank−1)·4/n) — one integer
    expression, identical in both engines (ntile's remainder placement
    differs; documented in quantile_bucket)."""
    from bigdatamanagement_spark.operators.rank import (
        global_row_number,
        quantile_bucket,
    )

    base = (
        _t(spark, sf_dir)["orders"]
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("rec"),
            F.count("*").alias("freq"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("mon_c"),
        )
    )
    r, n = global_row_number(base, [F.desc("rec"), F.asc("custkey")], "rr")
    f, _ = global_row_number(r, [F.desc("freq"), F.asc("custkey")], "fr")
    m, _ = global_row_number(f, [F.desc("mon_c"), F.asc("custkey")], "mr")
    scored = m.select(
        "custkey",
        quantile_bucket("rr", n, 4).alias("r_score"),
        quantile_bucket("fr", n, 4).alias("f_score"),
        quantile_bucket("mr", n, 4).alias("m_score"),
    )
    return scored.select(
        "*",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("segment"),
    ).orderBy("custkey")


QUERIES = {
    "t01_top10_recent_orders_america": top10_recent_orders_america,
    "t02_urgent_spend_largest_segment": urgent_spend_largest_segment,
    "t03_lineitem_count_by_priority": lineitem_count_by_priority,
    "t02b_customer_rfm_segments": customer_rfm_segments,
}

ORACLE = {
    "t01_top10_recent_orders_america": """
        SELECT o.o_orderkey, o.o_totalprice,
               CAST(o.o_orderdate AS DATE) AS o_orderdate
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'AMERICA'
        ORDER BY CAST(o.o_orderdate AS DATE) DESC, o.o_orderkey DESC
        LIMIT 10
    """,
    "t02_urgent_spend_largest_segment": """
        WITH largest_segment AS (
            SELECT c_mktsegment
            FROM customer
            GROUP BY c_mktsegment
            ORDER BY COUNT(*) DESC, c_mktsegment ASC
            LIMIT 1
        )
        SELECT c.c_custkey, ROUND(SUM(o.o_totalprice), 2) AS total_spent
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE o.o_orderpriority = '1-URGENT'
          AND o.o_orderstatus <> 'F'
          AND r.r_name <> 'EUROPE'
          AND c.c_mktsegment = (SELECT c_mktsegment FROM largest_segment)
        GROUP BY c.c_custkey
        ORDER BY total_spent DESC, c.c_custkey ASC
    """,
    "t03_lineitem_count_by_priority": """
        SELECT o.o_orderpriority, COUNT(l.l_linenumber) AS lineitem_count
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate >= TIMESTAMP '1997-04-01'
          AND o.o_orderdate < TIMESTAMP '2003-04-01'
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
    "t02b_customer_rfm_segments": """
        WITH base AS (
            SELECT o_custkey AS custkey,
                   MAX(o_orderdate) AS rec,
                   COUNT(*) AS freq,
                   SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS mon_c
            FROM orders GROUP BY 1
        ),
        ranked AS (
            SELECT custkey,
                   row_number() OVER (ORDER BY rec DESC, custkey) AS rr,
                   row_number() OVER (ORDER BY freq DESC, custkey) AS fr,
                   row_number() OVER (ORDER BY mon_c DESC, custkey) AS mr
            FROM base
        ),
        n AS (SELECT COUNT(*) AS n FROM base),
        scored AS (
            SELECT custkey,
                   CAST(1 + ((rr - 1) * 4) // n AS INT) AS r_score,
                   CAST(1 + ((fr - 1) * 4) // n AS INT) AS f_score,
                   CAST(1 + ((mr - 1) * 4) // n AS INT) AS m_score
            FROM ranked CROSS JOIN n
        )
        SELECT custkey, r_score, f_score, m_score,
               r_score::VARCHAR || f_score::VARCHAR || m_score::VARCHAR AS segment
        FROM scored ORDER BY custkey
    """,
}
