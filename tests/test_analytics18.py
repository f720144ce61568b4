"""Oracle + semantics tests for the distinctive-vocabulary /
model-validation / identity-resolution pack (queries/analytics18.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics18
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics18.ORACLE))
def test_analytics18_oracle(spark, duck, sf_dir, name):
    df = analytics18.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics18.ORACLE[name])


def test_logodds_ranked_within_source(spark, sf_dir):
    rows = analytics18.distinctive_terms_logodds(spark, sf_dir).collect()
    assert rows
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        assert [r["rn"] for r in rs] == list(range(1, len(rs) + 1))
        for prev, cur in zip(rs, rs[1:]):
            assert cur["logodds_micro"] <= prev["logodds_micro"]


def test_cv_folds_partition_events(spark, duck, sf_dir):
    rows = analytics18.cv_classifier_folds(spark, sf_dir).collect()
    assert len(rows) == analytics18._CV_FOLDS
    n_events = duck.execute("SELECT COUNT(*) FROM events").fetchone()[0]
    assert sum(r["n_test"] for r in rows) == n_events
    for r in rows:
        assert r["brier_micro"] >= 0 and r["n_test"] > 0


def test_stitching_conserves_users(spark, sf_dir):
    r = analytics18.ip_identity_stitching(spark, sf_dir).collect()[0]
    assert r["n_users"] == 2000  # kv fixture size
    assert r["n_identities"] + r["n_stitched_groups"] <= r["n_users"]
    assert r["n_identities"] < r["n_users"]  # some /16 sharing exists
    assert r["largest_identity"] >= 2


def test_binseg_levels(spark, sf_dir):
    rows = {r["level"]: r for r in
            analytics18.binary_segmentation_changepoints(spark, sf_dir).collect()}
    assert 1 in rows
    total_days = rows[1]["seg_days"]
    for lvl, r in rows.items():
        assert r["peak_ns"] >= 0 and 1 <= r["seg_days"] <= total_days
    if 2 in rows and 3 in rows:
        assert rows[2]["seg_days"] + rows[3]["seg_days"] == total_days
        assert rows[2]["cp_day"] <= rows[1]["cp_day"] < rows[3]["cp_day"]
