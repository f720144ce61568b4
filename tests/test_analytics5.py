"""Oracle + semantics tests for the schema-discovery/BI pack
(queries/analytics5.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics5
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics5.ORACLE))
def test_analytics5_oracle(spark, duck, sf_dir, name):
    df = analytics5.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics5.ORACLE[name])


def test_fd_pk_holds_and_profile_is_complete(spark, sf_dir):
    rows = {r["fd"]: r for r in analytics5.fd_profile(spark, sf_dir).collect()}
    assert len(rows) == len(analytics5._FD_CANDIDATES)
    pk = rows["orders.o_orderkey->o_orderstatus"]
    assert pk["n_violating"] == 0 and pk["max_dep_values"] == 1  # PK ⇒ FD holds
    multi = rows["lineitem.l_orderkey->l_shipdate"]
    assert multi["max_dep_values"] >= 1
    for r in rows.values():
        assert 0 <= r["viol_bp"] <= 10000
        assert r["n_violating"] <= r["n_keys"]


def test_revenue_shares_sum_to_parent(spark, sf_dir):
    rows = analytics5.revenue_share_hierarchy(spark, sf_dir).collect()
    by_region: dict[str, list] = {}
    for r in rows:
        by_region.setdefault(r["r_name"], []).append(r)
    world = sum(r["rev_cents"] for r in rows)
    for reg, rs in by_region.items():
        region_total = rs[0]["region_cents"]
        assert sum(r["rev_cents"] for r in rs) == region_total  # exact conservation
        # floored shares sum into (10000 − |children|, 10000]
        s = sum(r["region_share_bp"] for r in rs)
        assert 10000 - len(rs) < s <= 10000
    assert sum(r["world_share_bp"] for r in rows) <= 10000
    assert world > 0


def test_seasonal_naive_scores_exactly_span_minus_7_days(spark, sf_dir):
    import pyspark.sql.functions as F

    rows = analytics5.seasonal_naive_backtest(spark, sf_dir).collect()
    assert rows
    ev = analytics5.load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ].select(F.to_date("ts").alias("day"))
    span = ev.agg(
        (F.datediff(F.max("day"), F.min("day")) + 1).alias("days")
    ).first()["days"]
    for r in rows:
        assert r["n_days"] == span - 7  # first 7 grid days have no lag-7
        assert r["mae_floor"] >= 0


def test_ltv_triangle_diagonal_conservation(spark, sf_dir):
    """Cell (cohort, 0) must contain every cohort member (each user is
    active in their own first month), and total revenue across the
    triangle equals total purchase revenue."""
    import pyspark.sql.functions as F

    rows = analytics5.ltv_cohort_triangle(spark, sf_dir).collect()
    ev = analytics5.load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]
    total_rev = ev.filter(F.col("event_type") == "purchase").agg(
        F.sum(F.expr("CAST(round(value * 1000000.0, 0) AS BIGINT)"))
    ).first()[0]
    assert sum(r["rev_micro"] for r in rows) == total_rev
    zero_age = {r["cohort_month"]: r["n_active"] for r in rows if r["months_since"] == 0}
    cohort_sizes = {
        r["cohort_month"]: r["n"]
        for r in ev.groupBy("user_id")
        .agg(F.min(F.trunc(F.to_date("ts"), "MM")).alias("cohort_month"))
        .groupBy("cohort_month")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert zero_age == cohort_sizes


def test_duplicate_screen_counts_adjacent_pairs_only(spark):
    """3 identical charges in 4 minutes = 2 adjacent pairs (not 3
    combinations) — pins the lag-window (no self-join) semantics."""
    import datetime as dt
    import bigdatamanagement_spark.queries.analytics5 as a5

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, i, "purchase", 9.99, base + dt.timedelta(minutes=2 * i))
        for i in range(3)
    ] + [(1, 9, "purchase", 5.00, base)]
    ev = spark.createDataFrame(
        rows, schema="user_id bigint, event_id bigint, event_type string,"
        " value double, ts timestamp_ntz"
    )
    orig = a5.load_testdata
    try:
        a5.load_testdata = lambda s, d, tables=None, register=None: {"events": ev}
        r = a5.duplicate_charge_screen(spark, "ignored").first()
    finally:
        a5.load_testdata = orig
    assert r["n_suspect_pairs"] == 2
    assert r["n_users"] == 1
    assert r["tightest_gap_us"] == 120_000_000


def test_invoice_reconciliation_covers_every_order(spark, sf_dir):
    r = analytics5.invoice_reconciliation(spark, sf_dir).first()
    o = analytics5.load_testdata(spark, sf_dir, tables=("orders",), register=False)[
        "orders"
    ]
    assert r["n_orders"] == o.count()
    assert r["n_exact"] + r["n_without_lines"] <= r["n_orders"]
    assert r["total_diff_cents"] >= r["max_diff_cents"] >= 0


def test_zipf_slope_is_negative_and_ranked_fit_sane(spark, sf_dir):
    r = analytics5.zipf_slope(spark, sf_dir).first()
    assert r["n_terms"] > 10
    # frequency decreases with rank, so the log-log slope is negative
    assert r["slope_micro"] < 0
    # most-frequent-term fit: intercept ≈ ln(max freq) within an order
    assert r["intercept_micro"] > 0


def test_kwic_contexts_really_flank_the_term(spark, sf_dir):
    import pyspark.sql.functions as F
    from bigdatamanagement_spark.operators import text as T

    rows = analytics5.kwic_concordance(spark, sf_dir).collect()
    assert rows and len(rows) <= 10
    top = rows[0]
    # recount the top context straight from the corpus
    d = analytics5.load_testdata(spark, sf_dir, tables=("documents",), register=False)[
        "documents"
    ].select(T.tokens(F.col("text")).alias("t")).collect()
    n = 0
    for r in d:
        t = r["t"]
        for i, w in enumerate(t):
            if w == analytics5._KWIC_TERM:
                prev = t[i - 1] if i > 0 else "^"
                nxt = t[i + 1] if i < len(t) - 1 else "$"
                if prev == top["prev_word"] and nxt == top["next_word"]:
                    n += 1
    assert n == top["n_occurrences"]


def test_growth_accounting_identity_dau(spark, sf_dir):
    """DAU(d) = new + retained + resurrected, exactly, every day; and
    total new across the ledger = total distinct users."""
    import pyspark.sql.functions as F

    rows = analytics5.growth_accounting_daily(spark, sf_dir).collect()
    ev = analytics5.load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ].select("user_id", F.to_date("ts").alias("day"))
    dau = {
        r["day"]: r["n"]
        for r in ev.distinct().groupBy("day").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in rows:
        assert r["n_new"] + r["n_retained"] + r["n_resurrected"] == dau[r["day"]]
    assert sum(r["n_new"] for r in rows) == ev.select("user_id").distinct().count()


def test_tier_migration_matrix_conserves_both_halves(spark, sf_dir):
    rows = analytics5.customer_tier_migration(spark, sf_dir).collect()
    h1_total = sum(r["n_customers"] for r in rows if r["tier_h1"] != "none")
    h2_total = sum(r["n_customers"] for r in rows if r["tier_h2"] != "none")
    assert h1_total > 0 and h2_total > 0
    # each half's tier counts are near-balanced quartiles
    from collections import Counter

    c1 = Counter()
    for r in rows:
        if r["tier_h1"] != "none":
            c1[r["tier_h1"]] += r["n_customers"]
    if len(c1) == 4:
        assert max(c1.values()) - min(c1.values()) <= 1


def test_km_survival_decreases_with_horizon_and_bounds(spark, sf_dir):
    import math

    rows = analytics5.km_repeat_purchase_survival(spark, sf_dir).collect()
    assert [r["horizon_days"] for r in rows] == list(analytics5._KM_HORIZONS)
    logs = [r["log_surv_micro"] for r in rows]
    # survival is non-increasing in the horizon; log ≤ 0
    assert logs == sorted(logs, reverse=True)
    assert all(v <= 0 for v in logs)
    # KM with censoring must not report LOWER survival than the naive
    # (censor-dropping) estimator's upper bound of events/total
    for r in rows:
        s = math.exp(r["log_surv_micro"] / 1e6)
        assert 0.0 <= s <= 1.0
        assert r["repeat_events"] >= 0 and r["min_at_risk"] >= 1
