"""Oracle + semantics tests for the integer-PPR / auto-binning /
information / wavelet / training-pairs pack (queries/analytics19.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics19
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics19.ORACLE))
def test_analytics19_oracle(spark, duck, sf_dir, name):
    df = analytics19.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics19.ORACLE[name])


def test_ppr_mass_bounded(spark, sf_dir):
    rows = analytics19.personalized_pagerank(spark, sf_dir).collect()
    assert rows
    total = sum(r["ppr_micro"] for r in rows)
    # flooring only ever LOSES mass; teleport injects 150k/round
    assert 0 < total <= analytics19._MICRO + 3 * 150_000
    assert rows[0]["ppr_micro"] >= rows[-1]["ppr_micro"]


def test_fd_histogram_covers_all(spark, duck, sf_dir):
    rows = analytics19.fd_auto_histogram(spark, sf_dir).collect()
    n = duck.execute(
        "SELECT COUNT(*) FROM events WHERE event_type = 'purchase'"
    ).fetchone()[0]
    assert sum(r["cnt"] for r in rows) == n
    widths = {r["width_centi"] for r in rows}
    assert len(widths) == 1 and min(widths) >= 1
    for r in rows:
        assert r["bin"] >= 0


def test_mi_total_nonnegative(spark, sf_dir):
    rows = analytics19.mutual_information_hour_type(spark, sf_dir).collect()
    assert rows
    # MI >= 0 in exact arithmetic; per-cell floors can undershoot by
    # <= |cells| micro-units
    assert sum(r["mi_contrib_scaled"] for r in rows) >= -200


def test_haar_shrinks(spark, sf_dir):
    rows = {r["level"]: r for r in
            analytics19.haar_energy_spectrum(spark, sf_dir).collect()}
    assert set(rows) == {1, 2}
    assert rows[2]["n_coeffs"] <= rows[1]["n_coeffs"] // 2 + 1
    for r in rows.values():
        assert r["energy"] >= 0


def test_negative_pool_bounded(spark, duck, sf_dir):
    rows = analytics19.negative_sampling_pairs(spark, sf_dir).collect()
    assert rows
    n_pos = rows[0]["n_positives"]
    total_negs = sum(r["n_negatives"] for r in rows)
    assert 0 < total_negs <= n_pos * analytics19._NEG_K
    assert all(r["event_type"] != "purchase" for r in rows)
