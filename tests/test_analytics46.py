"""Oracle + property tests for the training-mixture planning pack (T64)."""

import pytest

from bigdatamanagement_spark.queries import analytics46
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics46.QUERIES))
def test_t64_oracle(spark, duck, sf_dir, name):
    df = analytics46.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics46.ORACLE[name])


def test_mixture_plan_binding_constraint(spark, sf_dir):
    """The binding language's utilization reads 10000 bp (or one floor
    below); no language exceeds its pool."""
    rows = analytics46.mixture_token_plan(spark, sf_dir).collect()
    assert rows
    assert all(r.allocated_tokens <= r.available_tokens for r in rows)
    assert max(r.utilization_bp for r in rows) >= 9999
    # weights cover the plan: allocations sum to ~plan_total (floor slack)
    plan = rows[0].plan_total
    total_alloc = sum(r.allocated_tokens for r in rows)
    assert plan - len(rows) <= total_alloc <= plan


def test_epoch_plan_budget_conservation(spark, sf_dir):
    """Targets sum to ~budget; every language repeats (epochs > 1e6
    micro) because the budget exceeds total availability."""
    rows = analytics46.epoch_repetition_plan(spark, sf_dir).collect()
    budget = rows[0].budget_tokens
    total_target = sum(r.target_tokens for r in rows)
    assert budget - len(rows) <= total_target <= budget
    assert all(r.epochs_micro > 1_000_000 for r in rows)


def test_temperature_weights_normalize(spark, sf_dir):
    rows = analytics46.quality_temperature_weights(spark, sf_dir).collect()
    total_bp = sum(r.share_bp for r in rows)
    # floor division loses at most 1 bp per source
    assert 10_000 - len(rows) <= total_bp <= 10_000
    # higher mean quality must never get a smaller weight (exp monotone)
    by_q = sorted(rows, key=lambda r: r.mean_q_micro)
    ws = [r.w_micro for r in by_q]
    assert ws == sorted(ws)


def test_token_yield_waterfall_monotone(spark, sf_dir):
    """raw >= exact >= 0 and raw >= near: each dedup stage only removes."""
    rows = analytics46.dedup_token_yield(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.raw_tokens >= r.exact_tokens > 0
        assert r.raw_tokens >= r.near_tokens > 0


def test_mixture_realization_tracks_targets(spark, sf_dir):
    """Realization within ~doc-granularity of targets: each language's
    gap stays under 10% (docs are ~30 tokens vs thousands of target
    tokens at every SF) and realized >= one full epoch's availability
    when epochs_micro >= 1e6."""
    rows = analytics46.mixture_realization(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.gap_bp <= 1_000, r
        assert r.realized_tokens > 0
