"""Set-operation / grouping-extension pack: the Spark surfaces SURVEY
§2.7/§2.4 notes as "exposed but outside the reference's contract" —
promoted here to oracle-checked queries so the engine's full relational
surface is driver-verified.

INTERSECT / EXCEPT over the music fixture (complement of Q-U01's UNION)
and ROLLUP / CUBE / GROUPING SETS over orders.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.queries.music import _V as _MUSIC_V
from bigdatamanagement_spark.queries.music import tables as music_tables


def rock_not_ed(spark, sf_dir) -> DataFrame:
    """EXCEPT: rock songs minus Ed Sheeran's (SQL EXCEPT dedups)."""
    s = music_tables(spark)["songs"]
    rock = s.filter(F.col("genre") == "Rock").select("title", "artist")
    ed = s.filter(F.col("artist") == "Ed Sheeran").select("title", "artist")
    return rock.exceptAll(ed).distinct()


def taylor_and_pop(spark, sf_dir) -> DataFrame:
    """INTERSECT: Taylor Swift's songs ∩ Pop songs."""
    s = music_tables(spark)["songs"]
    taylor = s.filter(F.col("artist") == "Taylor Swift").select("title", "artist")
    pop = s.filter(F.col("genre") == "Pop").select("title", "artist")
    return taylor.intersect(pop)


def orders_rollup(spark, sf_dir) -> DataFrame:
    """ROLLUP (status, priority): subtotal rows carry NULL group keys."""
    o = load_testdata(spark, sf_dir, tables=("orders",), register=False)["orders"]
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def orders_cube(spark, sf_dir) -> DataFrame:
    """CUBE (status, priority): all grouping-set combinations."""
    o = load_testdata(spark, sf_dir, tables=("orders",), register=False)["orders"]
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def orders_grouping_sets(spark, sf_dir) -> DataFrame:
    """Explicit GROUPING SETS ((status), (priority), ()) — the general
    form ROLLUP/CUBE special-case, expressed through spark.sql (the
    DataFrame API has no grouping-sets builder; SQL is the engine's
    co-equal entry surface). One Expand + one aggregate — NOT a union of
    three scans."""
    load_testdata(spark, sf_dir, tables=("orders",))  # registers the view
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


QUERIES = {
    "agg_orders_grouping_sets": orders_grouping_sets,
    "setop_rock_not_ed": rock_not_ed,
    "setop_taylor_and_pop": taylor_and_pop,
    "agg_orders_rollup": orders_rollup,
    "agg_orders_cube": orders_cube,
}

ORACLE = {
    "agg_orders_grouping_sets": """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """,
    "setop_rock_not_ed": _MUSIC_V
    + """
    SELECT title, artist FROM songs WHERE genre = 'Rock'
    EXCEPT
    SELECT title, artist FROM songs WHERE artist = 'Ed Sheeran'
    """,
    "setop_taylor_and_pop": _MUSIC_V
    + """
    SELECT title, artist FROM songs WHERE artist = 'Taylor Swift'
    INTERSECT
    SELECT title, artist FROM songs WHERE genre = 'Pop'
    """,
    "agg_orders_rollup": """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """,
    "agg_orders_cube": """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """,
}
