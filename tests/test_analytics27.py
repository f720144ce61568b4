"""Oracle + semantics tests for the group-sequential / robust-scale /
pricing-audit / newsvendor pack (queries/analytics27.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics27
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics27.ORACLE))
def test_analytics27_oracle(spark, duck, sf_dir, name):
    df = analytics27.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics27.ORACLE[name])


def test_sequential_boundaries_shrink(spark, sf_dir):
    rows = analytics27.group_sequential_looks(spark, sf_dir).collect()
    assert [r["look"] for r in rows] == [1, 2, 3]
    assert rows[0]["boundary"] > rows[1]["boundary"] > rows[2]["boundary"]
    for r in rows:
        assert r["crossed"] == (abs(r["z"]) > r["boundary"])
        assert r["n0"] > 1 and r["n1"] > 1
    # cumulative looks only add users
    assert rows[1]["n0"] + rows[1]["n1"] >= rows[0]["n0"] + rows[0]["n1"]


def test_sn_below_sd_for_heavy_tails(spark, sf_dir):
    r = analytics27.sn_robust_scale(spark, sf_dir).collect()[0]
    assert r["sn_centi"] > 0
    assert r["classical_sd_centi"] > 0
    # Sn (unscaled) is a median of medians of |diffs| — same order of
    # magnitude as sd
    assert r["sn_centi"] < 10 * r["classical_sd_centi"]


def test_price_endings_top5(spark, sf_dir):
    rows = analytics27.price_ending_audit(spark, sf_dir).collect()
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    for prev, cur in zip(rows, rows[1:]):
        assert cur["c"] <= prev["c"]
    assert rows[0]["uniformity_chi2"] >= 0 or rows[0]["n_endings"] < 100


def test_newsvendor_levels_monotone_in_cr(spark, sf_dir):
    rows = analytics27.newsvendor_quantiles(spark, sf_dir).collect()
    by_brand: dict[str, dict[int, int]] = {}
    for r in rows:
        by_brand.setdefault(r["p_brand"], {})[r["cr"]] = r["stock_level"]
    assert by_brand
    for brand, levels in by_brand.items():
        crs = sorted(levels)
        for lo, hi in zip(crs, crs[1:]):
            assert levels[hi] >= levels[lo], brand
