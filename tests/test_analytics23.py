"""Oracle + semantics tests for the supply-chain-classification /
price-index / spectral-mode pack (queries/analytics23.py)."""

from __future__ import annotations

import math

import pytest

from bigdatamanagement_spark.queries import analytics23
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics23.ORACLE))
def test_analytics23_oracle(spark, duck, sf_dir, name):
    df = analytics23.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics23.ORACLE[name])


def test_abc_xyz_partitions_parts(spark, duck, sf_dir):
    rows = analytics23.abc_xyz_matrix(spark, sf_dir).collect()
    n_parts = duck.execute(
        "SELECT COUNT(DISTINCT l_partkey) FROM lineitem"
    ).fetchone()[0]
    assert sum(r["n_parts"] for r in rows) == n_parts
    total_rev = duck.execute(
        "SELECT SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)"
        " AS BIGINT)) FROM lineitem"
    ).fetchone()[0]
    assert sum(r["revenue_cents"] for r in rows) == total_rev
    # A rows carry more revenue per part than C rows on average
    by_abc: dict[str, list] = {}
    for r in rows:
        by_abc.setdefault(r["abc"], []).append(r)
    assert set(by_abc) <= {"A", "B", "C"} and "A" in by_abc


def test_fisher_between_l_and_p(spark, sf_dir):
    r = analytics23.fisher_price_index(spark, sf_dir).collect()[0]
    lo, hi = sorted((r["laspeyres"], r["paasche"]))
    assert lo - 1e-12 <= r["fisher"] <= hi + 1e-12
    assert math.isclose(
        r["fisher"], math.sqrt(r["laspeyres"] * r["paasche"]), rel_tol=1e-12
    )
    assert r["n_parts"] > 0


def test_dominant_mode_normalized(spark, sf_dir):
    rows = analytics23.dominant_comovement_mode(spark, sf_dir).collect()
    assert len(rows) == 5
    assert max(abs(r["mode_micro"]) for r in rows) == analytics23._MICRO
    # sign pinned: the first type's component is non-negative
    assert rows[0]["mode_micro"] >= 0
