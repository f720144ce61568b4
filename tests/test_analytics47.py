"""Oracle + metric-sanity tests for the ANN retrieval-quality pack (T65)."""

import pytest

from bigdatamanagement_spark.queries import analytics47
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics47.QUERIES))
def test_t65_oracle(spark, duck, sf_dir, name):
    df = analytics47.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics47.ORACLE[name])


@pytest.mark.parametrize(
    "name", [n for n in sorted(analytics47.QUERIES) if "quality" in n]
)
def test_t65_metric_bounds(spark, sf_dir, name):
    rows = analytics47.QUERIES[name](spark, sf_dir).collect()
    assert len(rows) == 32  # one per query vector, no query dropped
    for r in rows:
        assert 0 <= r.recall_bp <= 10_000
        assert 0 <= r.rr_micro <= 1_000_000
        assert 0 <= r.ndcg_bp <= 10_000
        assert (r.n_hits == 0) == (r.recall_bp == 0)
    # the eval must be non-vacuous: some query finds some true neighbor
    assert any(r.n_hits > 0 for r in rows), name
