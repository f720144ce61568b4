"""T70 pretraining-hygiene pack: oracle goldens plus semantic pins —
NB predictions cover every doc exactly once, fertility ratios are
consistent with raw sums, and leakage is symmetric-free (a < b only).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from bigdatamanagement_spark.queries import analytics52
from tests.conftest import assert_matches_oracle


def test_t70_queries_match_oracle(spark, sf_dir, duck):
    for name, fn in analytics52.QUERIES.items():
        assert_matches_oracle(fn(spark, sf_dir), duck, analytics52.ORACLE[name])


def test_nb_predictions_partition_the_corpus(spark, sf_dir):
    from bigdatamanagement_spark.catalog import load_testdata

    docs = load_testdata(spark, sf_dir, tables=("documents",), register=False)[
        "documents"
    ]
    conf = analytics52.nb_lang_confusion(spark, sf_dir)
    assert conf.agg(F.sum("n_docs")).collect()[0][0] == docs.count()
    assert conf.where("n_docs <= 0").count() == 0


def test_nb_perfectly_separable_classes(spark):
    """On a corpus whose classes share no vocabulary, NB must be exact
    (diagonal confusion matrix) — pins the argmax and smoothing wiring
    independently of the synthetic corpus's class overlap."""
    from pyspark.sql import Window

    from bigdatamanagement_spark.operators.text import tokens

    d = spark.createDataFrame(
        [
            (1, "aa", "apple banana cherry apple banana"),
            (2, "aa", "banana cherry apple cherry"),
            (3, "bb", "dog elephant fox dog elephant"),
            (4, "bb", "elephant fox dog fox"),
        ],
        "doc_id long, lang string, text string",
    )
    occ = d.select("doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tok"))
    counts = occ.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c"))
    # a doc's own class must out-score the other on every doc: verify
    # via the same micro-nat construction the query uses.
    priors = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    grid = (
        priors.select(F.col("lang").alias("cls"))
        .crossJoin(occ.select("tok").distinct())
    )
    t_l = counts.groupBy("lang").agg(F.sum("c").alias("t_l"))
    v = occ.select("tok").distinct().count()
    lik = (
        grid.join(
            counts.select(F.col("lang").alias("cls"), "tok", "c"),
            ["cls", "tok"],
            "left",
        )
        .join(t_l.withColumnRenamed("lang", "cls"), "cls")
        .select(
            "cls",
            "tok",
            F.round(
                F.lit(1000000.0)
                * F.log(
                    (F.coalesce("c", F.lit(0)) + 1).cast("double")
                    / (F.col("t_l") + F.lit(v)).cast("double")
                ),
                0,
            )
            .cast("long")
            .alias("lp"),
        )
    )
    scored = (
        occ.join(lik, "tok")
        .groupBy("doc_id", "lang", "cls")
        .agg(F.sum("lp").alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "cls")
    pred = scored.withColumn("rn", F.row_number().over(w)).where("rn = 1")
    wrong = pred.where(F.col("lang") != F.col("cls")).count()
    assert wrong == 0


def test_leakage_pairs_canonical_and_positive(spark, sf_dir):
    rows = analytics52.cross_source_fp_leakage(spark, sf_dir).collect()
    for r in rows:
        assert r.source_a < r.source_b
        assert r.shared_fps > 0
