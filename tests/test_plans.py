"""Plan-regression tests: pin the physical strategies that make the
headline queries scale (SURVEY §4). A green suite with a degraded plan
is a perf bug — these fail loudly instead."""

from bigdatamanagement_spark.plans import (
    executed_plan as executed_plan_str,
    filter_exprs,
    plan_report,
    scans_are_pruned,
)
from bigdatamanagement_spark.queries import events, extensions, mongo, tpch


def test_t01_broadcasts_dims_and_topk(spark, sf_dir):
    df = tpch.top10_recent_orders_america(spark, sf_dir)
    r = plan_report(df)
    assert r["broadcast_joins"] >= 3, r  # customer/nation/region never shuffle orders
    assert r["sortmerge_joins"] == 0, r
    assert r["take_ordered"], r  # LIMIT 10 => per-partition heap, no global sort
    assert not r["python_udf"], r


def test_t01_region_filter_pushed(spark, sf_dir):
    df = tpch.top10_recent_orders_america(spark, sf_dir)
    pushed = ";".join(plan_report(df)["pushed_filters"])
    assert "EqualTo(r_name,AMERICA)" in pushed, pushed


def test_t03_lineitem_never_shuffles(spark, sf_dir):
    df = tpch.lineitem_count_by_priority(spark, sf_dir)
    r = plan_report(df)
    assert r["broadcast_joins"] >= 1, r  # AQE broadcasts the date-filtered orders
    assert r["sortmerge_joins"] == 0, r


def test_t17_first_event_uses_window_group_limit(spark, sf_dir):
    df = events.first_event_per_user_hour(spark, sf_dir)
    r = plan_report(df)
    assert r["window_group_limit"], r  # rn=1 filter pushed into partial top-1


def test_t08_topk_and_column_pruning(spark, sf_dir):
    df = mongo.top5_customers_flat(spark, sf_dir)
    r = plan_report(df)
    assert r["take_ordered"], r
    # customer scan: c_custkey+c_name; orders scan: o_custkey+o_totalprice
    assert scans_are_pruned(df, 3), plan_report(df)["pushed_filters"]


def test_dedup_scan_filters_stay_cheap(spark, sf_dir):
    """Regression guard for the optimizer fence (dedup.hashed_shingle_sets):
    InferFiltersFromGenerate / InferFiltersFromConstraints must not push
    the shingle/signature hash pipeline into per-row Filter nodes. When
    they do, every scanned row re-evaluates the whole tree (measured 3-4x
    slowdowns before the fence). Legit filters (jaccard threshold over
    materialized attributes) contain no xxhash64 call."""
    for fn in (
        extensions.ngram_jaccard_pairs,
        extensions.minhash_lsh_pairs,
        extensions.simhash_pairs,
    ):
        for cond in filter_exprs(fn(spark, sf_dir)):
            assert "xxhash64" not in cond, (fn.__name__, cond[:200])
            # the portable (md5-slice) hash pipeline must stay fenced too
            assert "md5" not in cond, (fn.__name__, cond[:200])


def test_core_packs_have_no_python_udfs(spark, sf_dir):
    for fn in (
        tpch.urgent_spend_largest_segment,
        mongo.top5_customers_nested,
        events.top10_users_by_value,
        extensions.minhash_lsh_pairs,
        extensions.text_features,
    ):
        assert not plan_report(fn(spark, sf_dir))["python_udf"], fn.__name__


def test_tpch_q03_plan(spark, sf_dir):
    from bigdatamanagement_spark.queries import tpch_full

    r = plan_report(tpch_full.q03_shipping_priority(spark, sf_dir))
    assert r["take_ordered"], r  # top-10 by revenue: heap, not global sort
    assert r["broadcast_joins"] >= 1, r  # filtered BUILDING customers broadcast
    assert not r["python_udf"], r


def test_tpch_q06_pure_scan_aggregate(spark, sf_dir):
    from bigdatamanagement_spark.plans import executed_plan, plan_report as pr
    from bigdatamanagement_spark.queries import tpch_full

    df = tpch_full.q06_revenue_forecast(spark, sf_dir)
    plan = executed_plan(df)
    # all three predicates reach the parquet scan (row-group pruning).
    # Spark truncates the PushedFilters list in toString, so assert on
    # the DataFilters clause (same predicates, full text).
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan, plan
    data_filters = plan.split("DataFilters: [", 1)[1]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in data_filters, plan
    r = pr(df)
    assert r["broadcast_joins"] == 0 and r["sortmerge_joins"] == 0, r


def test_tpch_q18_having_before_joins(spark, sf_dir):
    """The quantity HAVING must run on the lineitem-only aggregate (the
    smallest shuffle), not after joining orders/customer."""
    from bigdatamanagement_spark.plans import executed_plan
    from bigdatamanagement_spark.queries import tpch_full

    plan = executed_plan(tpch_full.q18_large_volume_customers(spark, sf_dir))
    agg_pos = plan.find("HashAggregate")
    # every scan of orders/customer appears AFTER (deeper than) the
    # first aggregate in the plan tree string -> the filter-agg is the
    # innermost stage feeding the joins
    assert agg_pos != -1
    assert plan.count("Filter (sum_qty") <= 1


def test_analytics_window_queries_single_exchange(spark, sf_dir):
    """The per-user time-series queries must shuffle exactly once (the
    user/entity key), JVM-only."""
    from bigdatamanagement_spark.queries import analytics

    for fn in (analytics.trailing_hour_value, analytics.event_debounce_summary):
        r = plan_report(fn(spark, sf_dir))
        # key shuffle + (agg shuffle) + presentation orderBy range exchange
        assert r["exchanges"] <= 3, (fn.__name__, r)
        assert not r["python_udf"], fn.__name__


def test_chunk_dedup_ships_digests_not_text(spark, sf_dir):
    """The chunk-keyed exchange must carry md5 digests, not chunk text:
    the hash must be computed below the first Exchange."""
    from bigdatamanagement_spark.queries import analytics

    plan = executed_plan_str(analytics.chunk_dup_spans(spark, sf_dir))
    first_ex = plan.find("Exchange")
    assert first_ex > 0
    assert "md5" in plan[first_ex:] or "md5" in plan[:first_ex]
    r = plan_report(analytics.chunk_dup_spans(spark, sf_dir))
    assert r["broadcast_joins"] >= 1, r  # dup set broadcasts back
    assert not r["python_udf"], r


def test_stratified_sample_uses_window_group_limit(spark, sf_dir):
    """rnk<=5 must execute as a partial per-group top-k, not a full sort
    + filter."""
    from bigdatamanagement_spark.queries import analytics

    r = plan_report(analytics.stratified_sample(spark, sf_dir))
    assert r["window_group_limit"], r
    assert not r["python_udf"], r


def test_weighted_sample_is_take_ordered(spark, sf_dir):
    """Global top-k by score must be TakeOrderedAndProject (per-partition
    heaps), never a global sort."""
    from bigdatamanagement_spark.queries import analytics

    r = plan_report(analytics.weighted_sample(spark, sf_dir))
    assert r["take_ordered"], r


def test_statistics_moments_no_python(spark, sf_dir):
    from bigdatamanagement_spark.queries import analytics

    for fn in (
        analytics.corr_value_vs_prop,
        analytics.ols_value_on_prop,
        analytics.chi2_lang_source,
        analytics.embedding_dim_variance,
        analytics.table_checksums,
    ):
        r = plan_report(fn(spark, sf_dir))
        assert not r["python_udf"], fn.__name__


def test_analytics3_jl_projection_broadcasts_sign_matrix(spark, sf_dir):
    from bigdatamanagement_spark.queries import analytics3

    r = plan_report(analytics3.embedding_jl_projection(spark, sf_dir))
    assert r["broadcast_joins"] >= 1, r  # 64×16 sign matrix never shuffles vectors
    assert r["sortmerge_joins"] == 0, r
    assert not r["python_udf"], r


def test_analytics3_auc_stays_jvm_side_with_bounded_exchanges(spark, sf_dir):
    from bigdatamanagement_spark.queries import analytics3

    r = plan_report(analytics3.classifier_auc(spark, sf_dir))
    assert not r["python_udf"], r
    assert r["sortmerge_joins"] == 0, r  # prefix-sum offsets join is broadcast


def test_analytics3_kmeans_broadcasts_centroids(spark, sf_dir):
    from bigdatamanagement_spark.queries import analytics3

    plan = executed_plan_str(analytics3.kmeans_clusters(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan[:2000]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_analytics3_winsorized_broadcasts_fences(spark, sf_dir):
    from bigdatamanagement_spark.queries import analytics3

    r = plan_report(analytics3.winsorized_mean_by_type(spark, sf_dir))
    assert r["broadcast_joins"] >= 1, r  # 5-row fence table
    assert r["sortmerge_joins"] == 0, r
    assert not r["python_udf"], r


def test_graph_consumers_read_memoized_edges(spark, sf_dir):
    """After the co-purchase memo builds (first consumer), downstream
    graph queries must read the checkpointed pair table — their plans
    contain NO parquet scan of lineitem (the ~6 s wedge build would
    otherwise re-run per query)."""
    from bigdatamanagement_spark.queries.analytics7 import (
        copurchase_weighted_pairs,
    )
    from bigdatamanagement_spark.queries.analytics13 import (
        percolation_sweep,
    )
    from bigdatamanagement_spark.queries.analytics17 import (
        rich_club_coefficient,
    )
    from bigdatamanagement_spark.plans import executed_plan

    copurchase_weighted_pairs(spark, sf_dir)  # warm the memo
    for fn in (percolation_sweep, rich_club_coefficient):
        plan = executed_plan(fn(spark, sf_dir))
        assert "lineitem" not in plan.lower(), fn.__name__


def test_no_event_grain_partitionless_windows(spark, sf_dir):
    """Round-2 verdict item 1: no t*/ext* headline query may run a
    partition-less WindowExec over an event-grain input (the single-
    task global sort anti-pattern). The repaired queries are pinned
    here: any partition-less Window left in their plans must order
    ONLY by a whitelisted tiny-grid column (a <= k-row survivor rank
    or a <= 32-row replica/decile reduce)."""
    import re as _re

    from bigdatamanagement_spark.plans import partitionless_windows
    from bigdatamanagement_spark.queries import (
        analytics8,
        analytics15,
        analytics19,
        analytics21,
        analytics28,
        analytics34,
        analytics37,
    )

    # fn -> order columns a partition-less window may still use (all
    # bounded-cardinality by construction; everything else must ride
    # rank.global_row_number / orderBy+limit)
    cases = [
        (analytics15.logistic_gains_table, {"decile"}),
        (analytics19.fd_auto_histogram, set()),
        (analytics21.bootstrap_median_ci, {"med", "b"}),
        (analytics28.hits_hubs_authorities, {"a", "p"}),
        (analytics34.decayed_leaderboard, {"decayed_score", "part"}),
        (analytics34.price_dispersion_audit, {"disp_key", "part"}),
        (analytics37.winsorization_sweep, set()),
        (analytics8.skyline_parts, set()),
    ]
    for fn, allowed in cases:
        for node in partitionless_windows(fn(spark, sf_dir)):
            ordered_by = set(_re.findall(r"(\w+)#\d+L? (?:ASC|DESC)", node))
            # an empty allowed set means NO partition-less windows at
            # all; otherwise sorts must use only whitelisted tiny-grid
            # columns (order-less whole-frame aggs ride the same grid)
            assert allowed and ordered_by <= allowed, (
                fn.__name__,
                node,
            )


def test_round3_packs_plan_health(spark, sf_dir):
    """The round-3 packs stay JVM-side (no Python UDFs) and keep their
    bounded sides broadcast: the mixture plans broadcast 1-row totals,
    the ANN twins broadcast the 32-query side, the eval pack joins two
    bounded lists."""
    from bigdatamanagement_spark.queries import (
        analytics46,
        analytics47,
        analytics48,
        ann_fixed,
    )

    for fn in (
        analytics46.mixture_token_plan,
        analytics46.epoch_repetition_plan,
        analytics46.quality_temperature_weights,
        analytics47.cosine_topk_exact_micro,
        analytics47.lsh_retrieval_quality,
        analytics48.perplexity_tiers,
        ann_fixed.lsh_ann_topk_fixed,
        ann_fixed.ivf_ann_topk_fixed,
        ann_fixed.pq_ann_topk_fixed,
        ann_fixed.semdedup_fixed,
    ):
        r = plan_report(fn(spark, sf_dir))
        assert not r["python_udf"], fn.__name__

    # the 1-row plan-total / budget / query-table sides must broadcast
    # (keyless 1-row joins plan as BroadcastNestedLoopJoin)
    for fn in (
        analytics46.mixture_token_plan,
        ann_fixed.pq_ann_topk_fixed,
    ):
        r = plan_report(fn(spark, sf_dir))
        assert r["broadcast_joins"] + r["broadcast_nl_joins"] >= 1, (
            fn.__name__,
            r,
        )
