"""T68 winnowing fingerprints + T69 DSIR importance resampling:
oracle goldens at the test SF, plus the semantic pins that make each
pack more than a hash identity — the winnowing GUARANTEE (a shared
k+w-1-word run always yields a shared fingerprint), exact-copy
containment, and the DSIR end-to-end signal (the target language's
selection rate dominates)."""

from __future__ import annotations

import pyspark.sql.functions as F

from bigdatamanagement_spark.operators.winnow import (
    candidate_pairs,
    winnow_fingerprints,
)
from bigdatamanagement_spark.queries import analytics50, analytics51
from tests.conftest import assert_matches_oracle


def test_t68_queries_match_oracle(spark, sf_dir, duck):
    for name, fn in analytics50.QUERIES.items():
        assert_matches_oracle(fn(spark, sf_dir), duck, analytics50.ORACLE[name])


def test_t69_queries_match_oracle(spark, sf_dir, duck):
    for name, fn in analytics51.QUERIES.items():
        assert_matches_oracle(fn(spark, sf_dir), duck, analytics51.ORACLE[name])


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_winnowing_guarantee_shared_run(spark):
    """Any shared run of k+w-1 = 7 words must contribute at least one
    identical fingerprint to both documents (Schleimer et al. Thm 1)."""
    run = "alpha beta gamma delta epsilon zeta eta"
    docs = _docs(
        spark,
        [
            (1, f"unrelated prefix words here {run} and a different tail"),
            (2, f"{run} completely other continuation of text follows now"),
        ],
    )
    fps = winnow_fingerprints(docs, "doc_id", "text")
    a = {r.fp for r in fps.where("doc_id = 1").collect()}
    b = {r.fp for r in fps.where("doc_id = 2").collect()}
    assert a & b, "7-word shared run produced no shared fingerprint"


def test_winnowing_exact_copy_full_containment(spark):
    docs = _docs(
        spark,
        [
            (1, "one two three four five six seven eight nine ten"),
            (2, "one two three four five six seven eight nine ten"),
            (3, "totally different words appear in this third document here"),
        ],
    )
    fps = winnow_fingerprints(docs, "doc_id", "text")
    pairs = {
        (r.doc_a, r.doc_b): r.shared
        for r in candidate_pairs(fps, df_cap=16, min_shared=1).collect()
    }
    n1 = fps.where("doc_id = 1").count()
    assert pairs.get((1, 2)) == n1  # identical docs share every fingerprint
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_winnowing_density_near_expected(spark, sf_dir):
    """Selected density ~ 2/(w+1) = 0.4 of the gram stream (MOSS §4);
    allow a wide band — the corpus is small and grams repeat."""
    stats = analytics50.winnow_fingerprint_stats(spark, sf_dir)
    rows = stats.collect()
    assert sum(r.n_fps for r in rows) > 0
    for r in rows:
        if r.n_fps:
            assert 200000 <= r.density_ppm <= 600000


def test_dsir_target_language_dominates_selection(spark, sf_dir):
    rates = {
        r.lang: r.sel_ppm
        for r in analytics51.dsir_resample_rates(spark, sf_dir).collect()
    }
    target = rates.pop(analytics51.TARGET_LANG)
    assert target > max(rates.values()), (
        f"target-language selection rate {target} not dominant over {rates}"
    )


def test_dsir_weights_cover_all_docs(spark, sf_dir):
    from bigdatamanagement_spark.catalog import load_testdata

    docs = load_testdata(spark, sf_dir, tables=("documents",), register=False)[
        "documents"
    ]
    w = analytics51._doc_weights(docs)
    assert w.count() == docs.count()
    assert w.where(F.col("w_micro").isNull()).count() == 0
