"""Oracle + semantics tests for the operations-analytics /
information-theory / causal pack (queries/analytics17.py)."""

from __future__ import annotations

import math

import pytest

from bigdatamanagement_spark.queries import analytics17
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics17.ORACLE))
def test_analytics17_oracle(spark, duck, sf_dir, name):
    df = analytics17.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics17.ORACLE[name])


def test_latency_percentiles_ordered(spark, sf_dir):
    rows = analytics17.ship_latency_percentiles(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["p50"] <= r["p90"] <= r["p99"]
        assert r["n"] > 0 and r["mean_days"] >= 0


def test_rich_club_monotone_vertices(spark, sf_dir):
    rows = {r["k"]: r for r in analytics17.rich_club_coefficient(spark, sf_dir).collect()}
    assert set(rows) == set(analytics17._RICH_KS)
    ks = sorted(rows)
    for lo, hi in zip(ks, ks[1:]):
        assert rows[hi]["v_k"] <= rows[lo]["v_k"]
        assert rows[hi]["e_k"] <= rows[lo]["e_k"]
    for r in rows.values():
        if r["phi_micro"] is not None:
            assert 0 <= r["phi_micro"] <= analytics17._MICRO


def test_entropy_rate_bounds(spark, sf_dir):
    rows = analytics17.markov_entropy_rate(spark, sf_dir).collect()
    assert rows
    # conditional entropy of a <=5-state chain is <= ln(5) nats
    cap = int(math.log(5) * 1e6) + 1
    total_rate = sum(r["rate_contrib_micro"] for r in rows)
    for r in rows:
        assert 0 <= r["h_cond_micro"] <= cap
    assert 0 < total_rate <= cap


def test_wilson_brackets_mle(spark, sf_dir):
    rows = analytics17.wilson_conversion_intervals(spark, sf_dir).collect()
    assert rows
    for r in rows:
        p = r["x"] / r["n"]
        eps = 1e-12  # at p = 1 the upper bound equals 1 up to rounding
        assert 0.0 <= r["wilson_lo"] <= p + eps
        assert p - eps <= r["wilson_hi"] <= 1.0 + eps


def test_did_matches_cell_means(spark, sf_dir):
    r = analytics17.diff_in_diff(spark, sf_dir).collect()[0]
    assert min(r["n_t1"], r["n_t2"], r["n_c1"], r["n_c2"]) > 0
    assert abs(r["did_centi"]) < 10_000_000  # sanity: < $100k shift
