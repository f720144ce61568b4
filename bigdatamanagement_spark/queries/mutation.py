"""Mutation pack: snapshot-producing MERGE semantics over the testdata.

Extends the reference's only mutation — the pre-query DELETE of
``Assignment 3/.../SQLonRDS.java:229-236`` (S-08, stock pack) — to the
full MERGE lifecycle (upsert + delete) the way a columnar lake does it:
derive a NEW snapshot from (base, changes); never update in place.
Operators in ``operators/merge.py``; the change set here is derived
deterministically from the base table so the oracle can mirror it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.operators.merge import apply_deletes, merge_upsert


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("orders",), register=False)["orders"]


def _updates(orders: DataFrame) -> DataFrame:
    """Deterministic change set: every 10th order re-priced +10% and
    flagged status 'U' (whole-row update semantics)."""
    return (
        orders.where(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
        .withColumn("o_orderstatus", F.lit("U"))
    )


def upsert_orders_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MUT-1 — post-merge snapshot checksum by status: row counts plus
    total price in exact integer cents (IEEE-deterministic quantization,
    so Spark and the oracle agree bit-for-bit). The merge itself is one
    left-anti join on the key — broadcast-able when the change set is a
    daily increment vs the full history."""
    orders = _orders(spark, sf_dir)
    merged = merge_upsert(orders, _updates(orders), ["o_orderkey"])
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    return (
        merged.groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"), F.sum(cents).alias("total_cents"))
        .orderBy("o_orderstatus")
    )


def delete_merge_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MUT-2 — delete every 7th order, then verify the snapshot: count and
    key-sum of survivors (exact integers)."""
    orders = _orders(spark, sf_dir)
    deletes = orders.where(F.col("o_orderkey") % 7 == 0).select("o_orderkey")
    snap = apply_deletes(orders, deletes, ["o_orderkey"])
    return snap.agg(
        F.count("*").alias("n_orders"),
        F.sum("o_orderkey").alias("key_sum"),
    )


QUERIES = {
    "mut_upsert_orders_summary": upsert_orders_summary,
    "mut_delete_survivors": delete_merge_roundtrip,
}

ORACLE = {
    "mut_upsert_orders_summary": """
        WITH updates AS (
            SELECT * REPLACE (o_totalprice * 1.1 AS o_totalprice,
                              'U' AS o_orderstatus)
            FROM orders WHERE o_orderkey % 10 = 0
        ),
        merged AS (
            SELECT * FROM orders WHERE o_orderkey % 10 <> 0
            UNION ALL SELECT * FROM updates
        )
        SELECT o_orderstatus, COUNT(*) AS n_orders,
               SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS total_cents
        FROM merged GROUP BY 1 ORDER BY 1
    """,
    "mut_delete_survivors": """
        SELECT COUNT(*) AS n_orders, SUM(o_orderkey) AS key_sum
        FROM orders WHERE o_orderkey % 7 <> 0
    """,
}
