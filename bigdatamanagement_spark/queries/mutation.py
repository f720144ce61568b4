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
from bigdatamanagement_spark.operators.merge import (
    apply_deletes,
    merge_upsert,
    snapshot_diff,
)


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("orders",), register=False)["orders"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("documents",), register=False)[
        "documents"
    ]


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


def corpus_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MUT-3 — release-over-release corpus audit: v1 drops every 7th doc,
    v2 drops every 5th and edits every 11th; the diff classifies every
    doc_id as added/removed/modified/unchanged and reports counts per
    (source, change_type). The diff is a keyed full outer join of content
    DIGESTS (md5 computed before the exchange), so the shuffle carries
    keys + 32-byte hashes, never document bodies."""
    docs = _docs(spark, sf_dir)
    v1 = docs.where(F.col("doc_id") % 7 != 0)
    v2 = docs.where(F.col("doc_id") % 5 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" v2-edit"))
        ).otherwise(F.col("text")),
    )
    d = snapshot_diff(v1, v2, ["doc_id"], ["text"])
    return (
        d.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source", "change_type")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("source", "change_type")
    )


def cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MUT-4 — ordered CDC changelog apply with tombstones (the
    Debezium-ingest MERGE pattern): the event log is read as a change
    stream for a per-user state table — signup/purchase/click/view
    upsert the state to the event's value, `error` is a DELETE
    tombstone. Latest op wins per user, ordered (ts, event_id); users
    whose final op is a tombstone leave the table. Output: live/
    tombstoned counts and exact micro checksums of the surviving
    state.

    Scale: apply = ONE user-keyed argmax (max_by over the full change
    history — with map-side partials, no sort) + a filter; the
    changelog never joins against itself. Generalizes S-08's
    delete-as-filter (`SQLonRDS.java:229-236`) to full CDC semantics."""
    ev = load_testdata(spark, sf_dir, tables=("events",), register=False)["events"]
    latest = (
        ev.select(
            "user_id",
            F.struct(
                F.col("ts"), F.col("event_id"), F.col("event_type"),
                F.expr("CAST(round(value * 1000000.0, 0) AS BIGINT)").alias("v"),
            ).alias("op"),
        )
        .groupBy("user_id")
        .agg(F.max("op").alias("op"))
        .select(
            "user_id",
            F.col("op.event_type").alias("last_op"),
            F.col("op.v").alias("state_micro"),
        )
    )
    return latest.agg(
        F.sum(F.when(F.col("last_op") != "error", 1).otherwise(0))
        .cast("long")
        .alias("n_live"),
        F.sum(F.when(F.col("last_op") == "error", 1).otherwise(0))
        .cast("long")
        .alias("n_tombstoned"),
        F.sum(F.when(F.col("last_op") != "error", F.col("state_micro")).otherwise(0))
        .cast("long")
        .alias("state_sum_micro"),
        F.max(F.when(F.col("last_op") != "error", F.col("state_micro")))
        .cast("long")
        .alias("max_state_micro"),
    )


QUERIES = {
    "mut_upsert_orders_summary": upsert_orders_summary,
    "mut_delete_survivors": delete_merge_roundtrip,
    "mut_corpus_version_diff": corpus_version_diff,
    "mut_cdc_apply_changelog": cdc_apply_changelog,
}

ORACLE = {
    "mut_cdc_apply_changelog": """
        WITH r AS (
            SELECT user_id, event_type,
                   CAST(round(value * 1000000.0, 0) AS BIGINT) AS v,
                   row_number() OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        )
        SELECT CAST(sum(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_live,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_tombstoned,
               CAST(sum(CASE WHEN event_type <> 'error' THEN v ELSE 0 END)
                   AS BIGINT) AS state_sum_micro,
               CAST(max(CASE WHEN event_type <> 'error' THEN v END)
                   AS BIGINT) AS max_state_micro
        FROM r WHERE rn = 1
    """,
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
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
        FROM merged GROUP BY 1 ORDER BY 1
    """,
    "mut_delete_survivors": """
        SELECT COUNT(*) AS n_orders, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM orders WHERE o_orderkey % 7 <> 0
    """,
    "mut_corpus_version_diff": """
        WITH v1 AS (
            SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 7 <> 0
        ),
        v2 AS (
            SELECT doc_id,
                   md5(CASE WHEN doc_id % 11 = 0 THEN text || ' v2-edit'
                            ELSE text END) AS h
            FROM documents WHERE doc_id % 5 <> 0
        ),
        d AS (
            SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
                   CASE WHEN v1.doc_id IS NULL THEN 'added'
                        WHEN v2.doc_id IS NULL THEN 'removed'
                        WHEN v1.h <> v2.h THEN 'modified'
                        ELSE 'unchanged' END AS change_type
            FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        )
        SELECT s.source, d.change_type, COUNT(*) AS n_docs
        FROM d JOIN documents s USING (doc_id)
        GROUP BY s.source, d.change_type
        ORDER BY s.source, d.change_type
    """,
}
