"""Oracle + semantics tests for the HDR-histogram / trend-detection /
conformal / diversification pack (queries/analytics22.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics22
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics22.ORACLE))
def test_analytics22_oracle(spark, duck, sf_dir, name):
    df = analytics22.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics22.ORACLE[name])


def test_hdr_buckets_cover_all_events(spark, duck, sf_dir):
    rows = analytics22.hdr_value_histogram(spark, sf_dir).collect()
    n = duck.execute("SELECT COUNT(*) FROM events").fetchone()[0]
    assert sum(r["cnt"] for r in rows) == n
    for r in rows:
        if r["bucket"] >= 0:
            assert r["lo_centi"] == 2 ** r["bucket"]
            assert r["hi_centi"] == 2 ** (r["bucket"] + 1) - 1


def test_movers_gain_is_rank_delta(spark, sf_dir):
    rows = analytics22.trending_rank_movers(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["rank_gain"] == r["rank_first"] - r["rank_second"]
        assert r["rank_first"] >= 1 and r["rank_second"] >= 1


def test_conformal_coverage_guarantee(spark, sf_dir):
    rows = analytics22.split_conformal_intervals(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # finite-sample guarantee: coverage >= ceil((n+1)*0.9)/n - 1/n
        assert r["coverage"] >= 0.9 - 1.0 / r["n_cal"]
        assert r["radius_centi"] >= 0 and r["n_covered"] <= r["n_cal"]


def test_mmr_picks_distinct_and_first_is_max_rel(spark, sf_dir):
    rows = analytics22.mmr_diversified_docs(spark, sf_dir).collect()
    assert [r["pick"] for r in rows] == list(range(1, analytics22._MMR_PICKS + 1))
    ids = [r["doc_id"] for r in rows]
    assert len(set(ids)) == len(ids)
    # scores can only degrade as the diversity penalty accumulates
    assert rows[0]["mmr_score_micro"] >= rows[1]["mmr_score_micro"]
