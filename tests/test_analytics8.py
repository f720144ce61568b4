"""Oracle + semantics tests for the rank-statistics / changepoint /
dominance / community pack (queries/analytics8.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics8
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics8.ORACLE))
def test_analytics8_oracle(spark, duck, sf_dir, name):
    df = analytics8.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics8.ORACLE[name])


def test_skyline_brute_force(spark, duck, sf_dir):
    pts = duck.execute(
        "SELECT p_partkey, CAST(round(p_retailprice * 100, 0) AS BIGINT), "
        "p_size FROM part"
    ).fetchall()
    want = sorted(
        k
        for k, pr, sz in pts
        if not any(
            (qpr <= pr and qsz >= sz and (qpr < pr or qsz > sz))
            for _, qpr, qsz in pts
        )
    )
    got = [
        r["p_partkey"]
        for r in analytics8.skyline_parts(spark, sf_dir).collect()
    ]
    assert got == want and len(got) > 0


def test_mann_whitney_python_recount(spark, duck, sf_dir):
    """Recompute U and z from raw values with a plain-python midrank
    pass and compare exactly (integers) / to 12 digits (doubles)."""
    rows = duck.execute(
        "SELECT CAST(round(value * 100, 0) AS BIGINT) AS v, event_type "
        "FROM events WHERE event_type IN ('purchase', 'click')"
    ).fetchall()
    vals = sorted(rows)
    # midranks: 2*rank is integral
    from collections import Counter

    cnt = Counter(v for v, _ in rows)
    two_rank = {}
    cum = 0
    for v in sorted(cnt):
        two_rank[v] = 2 * cum + cnt[v] + 1
        cum += cnt[v]
    two_r1 = sum(two_rank[v] for v, t in rows if t == "purchase")
    n1 = sum(1 for _, t in rows if t == "purchase")
    n2 = len(rows) - n1
    tie_t = sum(c**3 - c for c in cnt.values())
    got = analytics8.mann_whitney_value(spark, sf_dir).collect()[0]
    assert (got["n1"], got["n2"], got["two_r1"], got["tie_t"]) == (
        n1,
        n2,
        two_r1,
        tie_t,
    )
    import math

    u1 = (two_r1 - n1 * (n1 + 1)) / 2.0
    var = n1 * n2 / 12.0 * ((n1 + n2 + 1) - tie_t / ((n1 + n2) * (n1 + n2 - 1)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var)
    assert got["u1"] == u1
    assert abs(got["z"] - z) < 1e-9


def test_ks_bounds_and_location(spark, sf_dir):
    r = analytics8.ks_two_sample(spark, sf_dir).collect()[0]
    assert 0 < r["ks_num"] <= r["n1"] * r["n2"]
    assert 0.0 < r["ks_d"] <= 1.0
    assert r["at_value_centi"] is not None


def test_cusum_peak_in_range(spark, duck, sf_dir):
    r = analytics8.cusum_changepoint(spark, sf_dir).collect()[0]
    lo, hi = duck.execute(
        "SELECT MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)) FROM events "
        "WHERE event_type = 'purchase'"
    ).fetchone()
    assert lo <= r["peak_day"] <= hi
    assert r["max_abs_ns"] >= 0 and r["n_days"] > 0


def test_acf_within_unit_interval(spark, sf_dir):
    rows = analytics8.acf_daily_events(spark, sf_dir).collect()
    assert [r["lag"] for r in rows] == [1, 2, 7]
    for r in rows:
        assert abs(r["acf"]) <= 1.0 + 1e-12
        assert r["den_scaled"] > 0


def test_lpa_vertices_stable_and_labels_valid(spark, sf_dir):
    rows = {
        r["round"]: r
        for r in analytics8.label_propagation_communities(
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == {1, 2}
    assert rows[1]["n_vertices"] == rows[2]["n_vertices"] > 0
    for r in rows.values():
        assert 1 <= r["n_communities"] <= r["n_vertices"]
        assert r["max_community_size"] <= r["n_vertices"]
