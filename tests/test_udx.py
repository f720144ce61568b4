"""Equivalence tests for the Python function surfaces (scalar Pandas
UDF, grouped-agg Pandas UDAF, Python UDTF) against JVM-side plans —
pins that the Arrow boundary crossing is semantics-preserving."""

import math

import pyspark.sql.functions as F

from bigdatamanagement_spark.operators import udx


def test_scalar_pandas_udf_matches_jvm_expr(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(500)
    got = [
        r["y"] for r in ev.select(udx.log1p_udf()("value").alias("y")).collect()
    ]
    want = [
        r["y"] for r in ev.select(F.log1p("value").alias("y")).collect()
    ]
    assert all(math.isclose(g, w, rel_tol=1e-12) for g, w in zip(got, want))


def test_grouped_agg_udaf_matches_jvm_plan(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        r["event_type"]: r["wm"]
        for r in ev.groupBy("event_type")
        .agg(udx.weighted_mean_udaf()("value", "user_id").alias("wm"))
        .collect()
    }
    want = {
        r["event_type"]: r["wm"]
        for r in ev.groupBy("event_type")
        .agg((F.sum(F.col("value") * F.col("user_id")) / F.sum("user_id")).alias("wm"))
        .collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-9), (k, got[k], want[k])


def test_udtf_matches_jvm_shingles(spark, sf_dir):
    from bigdatamanagement_spark.operators.text import raw_shingles_from_tokens, tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    got = {
        (r["doc_id"], r["pos"]): r["gram"]
        for r in udx.ngram_rows(docs.select("doc_id", "text"), "text", 3).collect()
    }
    jvm = docs.select(
        "doc_id",
        F.posexplode(raw_shingles_from_tokens(tokens(F.col("text")), 3)).alias(
            "pos", "gram"
        ),
    )
    want = {(r["doc_id"], r["pos"]): r["gram"] for r in jvm.collect()}
    assert got == want
