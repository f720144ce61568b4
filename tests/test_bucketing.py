"""Bucketing: same-bucketed tables must join with zero Exchanges."""

import pyspark.sql.functions as F

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.plans import plan_report
from bigdatamanagement_spark.sources.bucketing import bucketed_join, write_bucketed


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast path
    try:
        t = load_testdata(spark, sf_dir, tables=("orders", "customer"), register=False)
        write_bucketed(
            t["orders"].withColumnRenamed("o_custkey", "custkey"),
            "orders_bkt", "custkey", 8,
        )
        write_bucketed(
            t["customer"].withColumnRenamed("c_custkey", "custkey"),
            "customer_bkt", "custkey", 8,
        )
        joined = bucketed_join(spark, "orders_bkt", "customer_bkt", "custkey")
        r = plan_report(joined)
        assert r["exchanges"] == 0, r  # co-located: no shuffle on either side
        # and the result is correct
        plain = t["orders"].join(
            t["customer"], t["orders"].o_custkey == t["customer"].c_custkey
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS customer_bkt")


def test_catalog_layout_resolution(spark, sf_dir):
    """The 'layout:<base>:<prefix>' sf_dir resolves each table through
    the standing layout catalog (saved table '<prefix>_<name>') and
    falls back to flat parquet for tables not materialized — query code
    swaps physical layouts without rewrites (tools/layout_bench.py).

    Extra PHYSICAL columns a layout carries (partition keys like
    ship_month) must be projected away: both layouts present the flat
    parquet's logical schema, so star-expansion / columns-driven queries
    cannot diverge between layouts."""
    import pyspark.sql.functions as F

    from bigdatamanagement_spark.catalog import load_testdata

    base = load_testdata(spark, sf_dir, tables=("region",), register=False)[
        "region"
    ]
    base.withColumn("marker", F.lit(1)).write.mode("overwrite").saveAsTable(
        "laytest_region"
    )
    try:
        t = load_testdata(
            spark,
            f"layout:{sf_dir}:laytest",
            tables=("region", "nation"),
            register=False,
        )
        # Resolved via the saved table (plan scans the catalog table,
        # not the flat parquet path) ...
        plan = t["region"]._jdf.queryExecution().optimizedPlan().toString()
        assert "laytest_region" in plan
        # ... but the physical-only column is hidden: identical logical
        # schema across layouts.
        assert t["region"].columns == base.columns
        assert "marker" not in t["nation"].columns  # flat fallback
        assert t["nation"].count() == 25
    finally:
        spark.sql("DROP TABLE IF EXISTS laytest_region")
