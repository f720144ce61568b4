"""Document pack: the reference's MongoDB queries (T04-T08).

Reference: Assignment 7/MongoDB.java — flat collections customer/orders
plus the denormalized nested ``custorders`` (customer + ORDERS array).
Each nested variant is computed through the nest()/unnest() operators
and must agree with its flat twin (dual-plan equivalence, SURVEY §5.2.3),
so both share one oracle SQL.

Scale notes: point lookups (T04/T05) push the key predicate into the
parquet scan (row-group pruning on min/max). The nested variants cost
one extra shuffle to build the array column — they exist for API parity
with the reference's custorders, and the flat plan is the fast path.
Top-5 (T08) is TakeOrderedAndProject after a partial-aggregated sum.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bigdatamanagement_spark import cache
from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.operators.nest import nest, unnest
from bigdatamanagement_spark.session import session_key

CUSTKEY = 42  # exists at every SF (keys are 0-based dense)
ORDERKEY = 32


def _t(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return load_testdata(spark, sf_dir, tables=("customer", "orders"), register=False)


# The nested views are the reference's STORED MongoDB collections —
# data materialized at ingest, not per-query intermediates — so they
# persist per CORPUS: content-keyed parquet in .bdm_cache
# (cache.persistent_df) built once (the collect_list shuffles), then
# every nested query in every session reads the snapshot.
_NEST_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def custorders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nested custorders view (N-01; MongoDB.java:242-301)."""
    key = (session_key(spark), sf_dir, "custorders")
    if key not in _NEST_MEMO:
        t = _t(spark, sf_dir)
        _NEST_MEMO[key] = cache.persistent_df(
            spark,
            "nested_custorders",
            sf_dir,
            ("customer", "orders"),
            "nest v1",
            lambda: nest(
                t["customer"], t["orders"], "c_custkey", "o_custkey", "orders"
            ),
        )
    return _NEST_MEMO[key]


def customer_name_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T04 — customer name by key (MongoDB.java:306-321 query1)."""
    t = _t(spark, sf_dir)
    return t["customer"].filter(F.col("c_custkey") == CUSTKEY).select("c_name")


def orderdate_by_orderkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T05 — order date by order key (MongoDB.java:327-342 query2)."""
    t = _t(spark, sf_dir)
    return (
        t["orders"]
        .filter(F.col("o_orderkey") == ORDERKEY)
        .select(F.col("o_orderdate").cast("date").alias("o_orderdate"))
    )


def orderdate_by_orderkey_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T06 — same via nested custorders (MongoDB.java:349-377 query2Nest):
    match-on-array-element, unwind, re-match, project (N-02..N-04)."""
    nested = custorders(spark, sf_dir)
    matched = nested.filter(
        F.exists("orders", lambda o: o["o_orderkey"] == ORDERKEY)
    )
    return (
        unnest(matched, "orders")
        .filter(F.col("orders.o_orderkey") == ORDERKEY)
        .select(F.col("orders.o_orderdate").cast("date").alias("o_orderdate"))
    )


def order_count_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T07a — total order count, flat (MongoDB.java:384-390 query3)."""
    t = _t(spark, sf_dir)
    return t["orders"].agg(F.count("*").alias("total_orders"))


def order_count_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T07b — total order count via nested arrays (MongoDB.java:396-420
    query3Nest: unwind + group sum(1); here Σ size(orders), N-07)."""
    nested = custorders(spark, sf_dir)
    return nested.agg(F.sum(F.size("orders")).cast("long").alias("total_orders"))


def top5_customers_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T08a — top-5 customers by total order amount (MongoDB.java:432-464
    query4: $lookup + $unwind (inner semantics) + group sum + sort + limit).
    Tiebreak c_custkey ASC appended for determinism."""
    t = _t(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_order_amount"))
        .orderBy(F.desc("total_order_amount"), F.asc("c_custkey"))
        .limit(5)
        .select("c_name", "total_order_amount")
    )


def top5_customers_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T08b — same via custorders (MongoDB.java:474-503 query4Nest).
    $unwind drops customers with no orders, matching the flat inner join."""
    nested = custorders(spark, sf_dir)
    return (
        unnest(nested, "orders")
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum(F.col("orders.o_totalprice")), 2).alias("total_order_amount"))
        .orderBy(F.desc("total_order_amount"), F.asc("c_custkey"))
        .limit(5)
        .select("c_name", "total_order_amount")
    )


def custorderitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-2 nested view: lineitems nested into orders, those orders
    nested into customers — array<struct<..., items array<struct>>>.
    The Dremel repeated-within-repeated shape (one level past the
    reference's custorders)."""
    key = (session_key(spark), sf_dir, "custorderitems")
    if key not in _NEST_MEMO:

        def _build() -> DataFrame:
            t = load_testdata(
                spark, sf_dir,
                tables=("customer", "orders", "lineitem"), register=False,
            )
            o2 = nest(
                t["orders"], t["lineitem"], "o_orderkey", "l_orderkey", "items"
            )
            return nest(t["customer"], o2, "c_custkey", "o_custkey", "orders")

        _NEST_MEMO[key] = cache.persistent_df(
            spark,
            "nested_custorderitems",
            sf_dir,
            ("customer", "orders", "lineitem"),
            "nest-depth2 v1",
            _build,
        )
    return _NEST_MEMO[key]


def depth2_quantity_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T08c — per-customer total lineitem quantity THROUGH the depth-2
    nested view: explode orders, explode each order's items, aggregate.
    Oracle is the flat 3-table join — the nested plan must be lossless.
    A second, explode-free plan (nested higher-order F.aggregate over
    both array levels — Dremel-style in-situ computation) is asserted
    equal in tests/test_mongo.py."""
    c2 = custorderitems(spark, sf_dir)
    return (
        unnest(c2, "orders")
        .select("c_custkey", F.explode("orders.items").alias("item"))
        .groupBy("c_custkey")
        .agg(
            F.sum(F.col("item.l_quantity").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_qty"),
            F.count("*").alias("n_items"),
        )
        .orderBy("c_custkey")
    )


def depth2_quantity_by_customer_inplace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode-free twin of T08c: nested F.aggregate folds over both
    array levels without generating any rows — the per-document
    computation Dremel does columnar-natively. No shuffle beyond the
    nest build; used as an equivalence check, not a driver entry."""
    c2 = custorderitems(spark, sf_dir)
    # decimal + decimal widens precision (18,6 -> 19,6) and a fold's
    # lambda must return the accumulator's exact type, so each step
    # casts back down (safe: sums here are far below 12 integer digits).
    dec = "decimal(18,6)"
    qty = F.aggregate(
        F.col("orders"),
        F.lit(0).cast(dec),
        lambda acc, o: (
            acc
            + F.aggregate(
                o["items"],
                F.lit(0).cast(dec),
                lambda a2, it: (a2 + it["l_quantity"].cast(dec)).cast(dec),
            )
        ).cast(dec),
    )
    n_items = F.aggregate(
        F.col("orders"), F.lit(0).cast("long"), lambda acc, o: acc + F.size(o["items"])
    )
    return (
        c2.select(
            "c_custkey",
            qty.cast("double").alias("total_qty"),
            n_items.alias("n_items"),
        )
        .filter(F.col("n_items") > 0)
        .orderBy("c_custkey")
    )


QUERIES = {
    "t08c_depth2_quantity_by_customer": depth2_quantity_by_customer,
    "t04_customer_name_by_key": customer_name_by_key,
    "t05_orderdate_by_orderkey": orderdate_by_orderkey,
    "t06_orderdate_by_orderkey_nested": orderdate_by_orderkey_nested,
    "t07_order_count_flat": order_count_flat,
    "t07_order_count_nested": order_count_nested,
    "t08_top5_customers_flat": top5_customers_flat,
    "t08_top5_customers_nested": top5_customers_nested,
}

_T05_SQL = f"""
    SELECT CAST(o_orderdate AS DATE) AS o_orderdate
    FROM orders WHERE o_orderkey = {ORDERKEY}
"""
_T07_SQL = "SELECT COUNT(*) AS total_orders FROM orders"
_T08_SQL = """
    SELECT c_name, ROUND(SUM(o_totalprice), 2) AS total_order_amount
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY total_order_amount DESC, c_custkey ASC
    LIMIT 5
"""

ORACLE = {
    "t08c_depth2_quantity_by_customer": """
        SELECT c.c_custkey,
               CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty,
               COUNT(*) AS n_items
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY c.c_custkey
        ORDER BY c.c_custkey
    """,
    "t04_customer_name_by_key": f"SELECT c_name FROM customer WHERE c_custkey = {CUSTKEY}",
    "t05_orderdate_by_orderkey": _T05_SQL,
    "t06_orderdate_by_orderkey_nested": _T05_SQL,  # dual-plan: flat SQL is the oracle
    "t07_order_count_flat": _T07_SQL,
    "t07_order_count_nested": _T07_SQL,
    "t08_top5_customers_flat": _T08_SQL,
    "t08_top5_customers_nested": _T08_SQL,
}
