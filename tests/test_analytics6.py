"""Oracle + semantics tests for the sequence-pattern / classification /
apportionment pack (queries/analytics6.py)."""

from __future__ import annotations

import re

import pytest

from bigdatamanagement_spark.queries import analytics6
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics6.ORACLE))
def test_analytics6_oracle(spark, duck, sf_dir, name):
    df = analytics6.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics6.ORACLE[name])


def test_pattern_match_python_recount(spark, duck, sf_dir):
    """Recount one pattern entirely in Python from the raw events —
    sessionization, string build, and non-overlapping regex count."""
    rows = duck.execute(
        "SELECT user_id, epoch_us(ts) AS us, event_id, event_type "
        "FROM events ORDER BY user_id, us, event_id"
    ).fetchall()
    sessions: dict[tuple, list[str]] = {}
    prev: dict[int, int] = {}
    seq: dict[int, int] = {}
    for uid, us, eid, etype in rows:
        if uid not in prev or us - prev[uid] > 1800 * 1_000_000:
            seq[uid] = seq.get(uid, 0) + 1
            if uid not in prev:
                seq[uid] = 1
        prev[uid] = us
        sessions.setdefault((uid, seq[uid]), []).append(etype[0])
    strings = ["".join(v) for v in sessions.values()]
    want_matches = sum(len(re.findall("v+c+p", s)) for s in strings)
    want_sessions = sum(1 for s in strings if re.search("v+c+p", s))
    got = {
        r["pattern"]: r
        for r in analytics6.session_pattern_match(spark, sf_dir).collect()
    }
    assert got["funnel_run"]["n_matches"] == want_matches
    assert got["funnel_run"]["n_sessions_matched"] == want_sessions


def test_nb_confusion_row_sums_equal_lang_doc_counts(spark, duck, sf_dir):
    rows = analytics6.nb_lang_confusion(spark, sf_dir).collect()
    by_actual: dict[str, int] = {}
    for r in rows:
        by_actual[r["actual_lang"]] = by_actual.get(r["actual_lang"], 0) + r["n_docs"]
    want = dict(
        duck.execute("SELECT lang, COUNT(*) FROM documents GROUP BY 1").fetchall()
    )
    assert by_actual == want  # every doc classified exactly once
    # on its own train set the classifier must beat the majority-class
    # baseline (the synthetic corpus shares most vocabulary across langs,
    # so the margin is modest — the discriminative signal is stopwords)
    correct = sum(r["n_docs"] for r in rows if r["actual_lang"] == r["pred_lang"])
    assert correct > max(want.values())


def test_quota_allocation_sums_to_budget(spark, sf_dir):
    rows = analytics6.sample_quota_allocation(spark, sf_dir).collect()
    assert sum(r["quota"] for r in rows) == analytics6._QUOTA_BUDGET
    for r in rows:
        assert r["quota"] in (r["base_quota"], r["base_quota"] + 1)
        assert r["extra"] in (0, 1)


def test_lateral_equals_window_form(spark, sf_dir):
    """The LATERAL top-3 must agree with the row_number window form."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    t = analytics6.load_testdata(
        spark, sf_dir, tables=("customer", "orders"), register=False
    )
    j = t["orders"].join(
        t["customer"], F.col("o_custkey") == F.col("c_custkey")
    ).select(
        "c_mktsegment",
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias("cents"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("cents").desc(), F.col("o_orderkey").asc()
    )
    want = {
        (r["c_mktsegment"], r["o_orderkey"], r["cents"])
        for r in j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .collect()
    }
    got = {
        (r["c_mktsegment"], r["o_orderkey"], r["cents"])
        for r in analytics6.lateral_top3_orders(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_vocab_richness_bounds(spark, sf_dir):
    for r in analytics6.vocab_richness_estimators(spark, sf_dir).collect():
        assert r["v_obs"] <= r["n_tokens"]
        assert r["f1_hapax"] + r["f2_dis"] <= r["v_obs"]
        assert r["chao1"] >= r["v_obs"]  # Chao1 only adds unseen mass
        assert 0 <= r["gt_unseen_bp"] <= 10000
