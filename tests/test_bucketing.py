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
