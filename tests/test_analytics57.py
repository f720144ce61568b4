"""T75 IVF-PQ: oracle golden plus the index-mechanics pins — every
corpus vector stores exactly M codes in one cell, every query probes
exactly NPROBE cells, and the composed index still retrieves (recall
floor against exact cosine on the shared query set)."""

from __future__ import annotations

from collections import defaultdict

import pyspark.sql.functions as F

from bigdatamanagement_spark.queries import analytics57
from bigdatamanagement_spark.queries.ann_fixed import NPROBE, PQ_M
from tests.conftest import assert_matches_oracle


def test_t75_matches_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        analytics57.ivfpq_ann_topk_fixed(spark, sf_dir),
        duck,
        analytics57.ORACLE["ext_ivfpq_ann_topk_fixed"],
    )


def test_index_mechanics(spark, sf_dir):
    codes = analytics57._corpus_codes(spark, sf_dir)
    per_vec = codes.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("cell").alias("cells"),
        F.count_distinct("m").alias("ms"),
    )
    bad = per_vec.where(
        (F.col("n") != PQ_M) | (F.col("cells") != 1) | (F.col("ms") != PQ_M)
    ).count()
    assert bad == 0
    qt = analytics57._query_tables(spark, sf_dir)
    per_q = qt.select("query_id", "cell").distinct().groupBy("query_id").count()
    assert per_q.where(F.col("count") != NPROBE).count() == 0


def test_ivfpq_retrieval_floor(spark, sf_dir):
    """The compressed, probed index must still overlap the exact
    cosine top-10 — a loose floor (ADC on residual codes of
    near-random vectors is noisy; the point is it is far from
    random: random top-10 overlap on this corpus would be ~2%)."""
    from bigdatamanagement_spark.operators import similarity as S
    from bigdatamanagement_spark.catalog import load_testdata
    from bigdatamanagement_spark.queries.extensions import TOPK_QUERY_IDS

    e = load_testdata(spark, sf_dir, tables=("embeddings",), register=False)[
        "embeddings"
    ]
    queries = e.filter(F.col("vec_id") < TOPK_QUERY_IDS)
    exact = S.cosine_topk(e, queries, k=10).collect()
    approx = analytics57.ivfpq_ann_topk_fixed(spark, sf_dir).collect()
    ex, ap = defaultdict(set), defaultdict(set)
    for r in exact:
        ex[r.query_id].add(r.neighbor_id)
    for r in approx:
        ap[r.query_id].add(r.neighbor_id)
    recalls = [len(ex[q] & ap[q]) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.1, sum(recalls) / len(recalls)
