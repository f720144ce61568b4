"""Oracle + semantics tests for the forensics/diagnostics pack
(queries/analytics4.py): Spearman, Benford audit, join-cost profile,
peer percentiles, cart abandonment."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bigdatamanagement_spark.queries import analytics4
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics4.ORACLE))
def test_analytics4_oracle(spark, duck, sf_dir, name):
    df = analytics4.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics4.ORACLE[name])


def test_spearman_matches_scipy_free_recompute(spark, sf_dir):
    """Recompute Spearman in pure python with tie-averaged ranks."""
    row = analytics4.spearman_value_vs_prop(spark, sf_dir).first()
    ev = analytics4._events(spark, sf_dir).select(
        F.expr("CAST(round(value * 1000000.0, 0) AS BIGINT)").alias("x"),
        F.get_json_object("props", "$.k").cast("long").alias("y"),
    ).filter(F.col("y").isNotNull()).collect()
    xs = [r["x"] for r in ev]
    ys = [r["y"] for r in ev]

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            avg = (i + 1 + j) / 2
            for k in range(i, j):
                ranks[order[k]] = avg
            i = j
        return ranks

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    mx = sum(rx) / n
    my = sum(ry) / n
    sxy = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    sxx = sum((a - mx) ** 2 for a in rx)
    syy = sum((b - my) ** 2 for b in ry)
    expect = sxy / (sxx * syy) ** 0.5
    assert abs(row["spearman_r"] - expect) < 1e-6
    assert row["n"] == n


def test_spearman_is_one_on_monotone_pairs(spark):
    """Spearman must hit exactly 1.0 on any strictly monotone pairing —
    pins the rank construction end-to-end (Pearson would not)."""
    import bigdatamanagement_spark.queries.analytics4 as a4

    ev = spark.createDataFrame(
        [(float(i), '{"k": %d}' % (i**3)) for i in range(1, 40)],
        schema="value double, props string",
    )
    orig = a4._events
    try:
        a4._events = lambda s, d: ev
        row = a4.spearman_value_vs_prop(spark, "ignored").first()
    finally:
        a4._events = orig
    assert row["spearman_r"] == 1.0


def test_benford_covers_all_mass_and_digits(spark, sf_dir):
    rows = analytics4.benford_first_digit_audit(spark, sf_dir).collect()
    digits = [r["digit"] for r in rows]
    assert digits == sorted(digits) and set(digits) <= set(range(1, 10))
    o = analytics4.load_testdata(spark, sf_dir, tables=("orders",), register=False)[
        "orders"
    ]
    assert sum(r["n"] for r in rows) == o.count()
    assert sum(analytics4._BENFORD_BP.values()) in range(9995, 10001)


def test_join_cost_profile_identities(spark, sf_dir):
    r = analytics4.partkey_join_cost_profile(spark, sf_dir).first()
    # Σc² = Σc + 2·Σc(c−1)/2
    assert r["join_rows"] == r["n_rows"] + 2 * r["n_pairs"]
    assert r["max_key_rows"] ** 2 <= r["join_rows"]
    li = analytics4.load_testdata(
        spark, sf_dir, tables=("lineitem",), register=False
    )["lineitem"]
    assert r["n_rows"] == li.count()


def test_segment_percentiles_span_0_to_10000(spark, sf_dir):
    rows = analytics4.segment_spend_percentiles(spark, sf_dir).collect()
    by_seg: dict[str, list[int]] = {}
    for r in rows:
        by_seg.setdefault(r["c_mktsegment"], []).append(r["pct_bp"])
    for seg, ps in by_seg.items():
        assert max(ps) == 10000  # the top peer is always p100
        assert min(ps) > 0


def test_cart_abandonment_covers_every_session(spark, sf_dir):
    rows = {r["outcome"]: r for r in
            analytics4.cart_abandonment_summary(spark, sf_dir).collect()}
    assert set(rows) == {"abandoned", "converted"}
    for r in rows.values():
        assert r["n_sessions"] > 0
        assert r["mean_dur_us"] >= 0
        assert r["mean_events_centi"] >= 100  # every session has ≥1 event


def test_time_decay_credits_halve_with_distance(spark):
    """Crafted user: click, view, click, purchase — distances from the
    conversion are 3, 2, 1, so credits are 250000, 500000, 1000000."""
    import datetime as dt
    import bigdatamanagement_spark.queries.analytics4 as a4

    base = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (1, 1, "click", base),
            (1, 2, "view", base + dt.timedelta(minutes=1)),
            (1, 3, "click", base + dt.timedelta(minutes=2)),
            (1, 4, "purchase", base + dt.timedelta(minutes=3)),
        ],
        schema="user_id bigint, event_id bigint, event_type string, ts timestamp_ntz",
    )
    orig = a4._events
    try:
        a4._events = lambda s, d: ev
        rows = {r["channel"]: r for r in
                a4.time_decay_attribution(spark, "ignored").collect()}
    finally:
        a4._events = orig
    # click@distance1 (1e6) + click@distance3 (250000); view@distance2 (500000)
    assert rows["click"]["credit_micro"] == 1_250_000
    assert rows["view"]["credit_micro"] == 500_000
    assert rows["click"]["n_touches"] == 2 and rows["view"]["n_touches"] == 1
