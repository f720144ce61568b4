"""T71 curriculum shards: oracle goldens plus the semantic pins —
shards fill to the budget (all but the last), mean quality is
non-increasing across shards (the curriculum property), and the
best-first budget never exceeds the token budget."""

from __future__ import annotations

import pyspark.sql.functions as F

from bigdatamanagement_spark.queries import analytics53
from tests.conftest import assert_matches_oracle


def test_t71_queries_match_oracle(spark, sf_dir, duck):
    for name, fn in analytics53.QUERIES.items():
        assert_matches_oracle(fn(spark, sf_dir), duck, analytics53.ORACLE[name])


def test_curriculum_shards_monotone_and_packed(spark, sf_dir):
    rows = analytics53.curriculum_shards(spark, sf_dir).collect()
    assert rows, "no shards produced"
    # contiguous shard ids from 0
    ids = [r.shard_id for r in rows]
    assert ids == list(range(len(ids)))
    # mean quality non-increasing (best-first curriculum)
    means = [r.mean_quality_bp for r in rows]
    assert all(a >= b for a, b in zip(means, means[1:])), means
    # greedy-packing boundary invariant: shard i holds exactly the docs
    # whose inclusive running sum lands in (i*b, (i+1)*b], so the
    # cumulative total after shard i sits inside that interval
    b = analytics53.SHARD_TOKENS
    running = 0
    for r in rows:
        running += r.shard_tokens
        assert r.shard_id * b < running <= (r.shard_id + 1) * b or r is rows[-1]
    # the final shard may end anywhere past its lower boundary
    assert rows[-1].shard_id * b < running


def test_best_first_budget_respects_budget(spark, sf_dir):
    rows = analytics53.best_first_budget(spark, sf_dir).collect()
    sel_tokens = sum(r.tokens_selected for r in rows)
    assert 0 < sel_tokens <= analytics53.TOKEN_BUDGET
    assert all(r.n_selected <= r.n_total for r in rows)
