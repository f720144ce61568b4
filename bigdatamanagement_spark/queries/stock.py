"""Stock pack: Assignment 3's MySQL-on-RDS queries (T13).

Reference: SQLonRDS.java:229-264. Replays the reference sequence: the
pre-query DELETE (S-08: ``priceDate < '2022-08-20' OR companyId = 2``)
is applied as an immutable-view filter re-registration, THEN queries 1-3
run. Exact `stock` fixture (fixtures/stock_*.parquet).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bigdatamanagement_spark.fixtures import ensure_fixtures, fixture_path

_DELETE_PRED = "(price_date < DATE '2022-08-20' OR company_id = 2)"


def tables(spark: SparkSession) -> dict[str, DataFrame]:
    ensure_fixtures()
    company = spark.read.parquet(fixture_path("stock_company"))
    sp = spark.read.parquet(fixture_path("stock_stockprice"))
    # S-08: DELETE as filter of the complement (engine is immutable-view based)
    sp = sp.filter(~((F.col("price_date") < F.lit("2022-08-20").cast("date")) | (F.col("company_id") == 2)))
    return {"company": company, "stockprice": sp}


_V = f"""
WITH company AS (SELECT * FROM read_parquet('{fixture_path("stock_company")}')),
     stockprice AS (SELECT * FROM read_parquet('{fixture_path("stock_stockprice")}')
                    WHERE NOT {_DELETE_PRED})
"""


def big_or_small_companies(spark, sf_dir) -> DataFrame:
    """T13-Q1 (SQLonRDS.java:238-244): disjunctive numeric filter + sort."""
    return (
        tables(spark)["company"]
        .filter((F.col("num_employees") > 10000) | (F.col("annual_revenue") < 1000000))
        .select("name", "annual_revenue", "num_employees")
        .orderBy("name")
    )


def weekly_stats(spark, sf_dir) -> DataFrame:
    """T13-Q2 (SQLonRDS.java:246-255): multi-aggregate per group over a
    BETWEEN date range, ordered by avg volume desc."""
    t = tables(spark)
    return (
        t["company"]
        .join(t["stockprice"], t["company"].id == t["stockprice"].company_id)
        .filter(F.col("price_date").between("2022-08-22", "2022-08-26"))
        .groupBy("id", "name", "ticker")
        .agg(
            F.min("low").alias("lowest_price"),
            F.max("high").alias("highest_price"),
            F.round(F.avg("close"), 4).alias("avg_close_price"),
            F.round(F.avg("volume"), 4).alias("avg_volume"),
        )
        .select("name", "ticker", "lowest_price", "highest_price", "avg_close_price", "avg_volume")
        .orderBy(F.desc("avg_volume"))
    )


def resilient_companies(spark, sf_dir) -> DataFrame:
    """T13-Q3 (SQLonRDS.java:257-264): left join with constant predicate in
    the ON clause (Q-J05) + left join against a derived aggregate subquery
    (Q-J06) + disjunctive NULL-tolerant filter."""
    t = tables(spark)
    c, sp = t["company"], t["stockprice"]
    s30 = sp.alias("s30")
    avg_week = (
        sp.filter(F.col("price_date").between("2022-08-15", "2022-08-19"))
        .groupBy("company_id")
        .agg(F.avg("close").alias("avg_close"))
        .alias("aw")
    )
    joined = (
        c.join(
            s30,
            (c.id == F.col("s30.company_id"))
            & (F.col("s30.price_date") == F.lit("2022-08-30").cast("date")),
            "left",
        )
        .join(avg_week, c.id == F.col("aw.company_id"), "left")
    )
    return (
        joined.filter(
            F.col("ticker").isNull()
            | (
                F.col("s30.close").isNotNull()
                & F.col("aw.avg_close").isNotNull()
                & (F.col("s30.close") >= F.col("aw.avg_close") * 0.9)
            )
        )
        .select("name", "ticker", F.col("s30.close").alias("closing_price_aug30"))
    )


QUERIES = {
    "t13_q1_big_or_small_companies": big_or_small_companies,
    "t13_q2_weekly_stats": weekly_stats,
    "t13_q3_resilient_companies": resilient_companies,
}

ORACLE = {
    "t13_q1_big_or_small_companies": _V
    + """
    SELECT name, annual_revenue, num_employees
    FROM company
    WHERE num_employees > 10000 OR annual_revenue < 1000000
    ORDER BY name ASC
    """,
    "t13_q2_weekly_stats": _V
    + """
    SELECT c.name, c.ticker, MIN(s.low) AS lowest_price, MAX(s.high) AS highest_price,
           ROUND(AVG(s.close), 4) AS avg_close_price, ROUND(AVG(s.volume), 4) AS avg_volume
    FROM company c JOIN stockprice s ON c.id = s.company_id
    WHERE s.price_date BETWEEN '2022-08-22' AND '2022-08-26'
    GROUP BY c.id, c.name, c.ticker
    ORDER BY avg_volume DESC
    """,
    "t13_q3_resilient_companies": _V
    + """
    SELECT c.name, c.ticker, s30.close AS closing_price_aug30
    FROM company c
    LEFT JOIN stockprice s30
      ON c.id = s30.company_id AND s30.price_date = DATE '2022-08-30'
    LEFT JOIN (
        SELECT company_id, AVG(close) AS avg_close
        FROM stockprice
        WHERE price_date BETWEEN '2022-08-15' AND '2022-08-19'
        GROUP BY company_id
    ) aw ON c.id = aw.company_id
    WHERE c.ticker IS NULL
       OR (s30.close IS NOT NULL AND aw.avg_close IS NOT NULL
           AND s30.close >= aw.avg_close * 0.9)
    """,
}
