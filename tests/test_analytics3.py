"""Oracle + semantics tests for the advanced-analytics pack 3
(queries/analytics3.py): BFS shortest hops, native recursive CTE,
SCD2 point-in-time lookup, group-split leakage audit, JL projection."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
import pytest

from bigdatamanagement_spark.queries import analytics3
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics3.ORACLE))
def test_analytics3_oracle(spark, duck, sf_dir, name):
    df = analytics3.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics3.ORACLE[name])


def test_bfs_hops_start_at_zero_and_expand_monotonically(spark, sf_dir):
    """Hop 0 is exactly the seed; every later hop is a set of NEW nodes
    (min-dist fold), and a nonempty hop k>1 implies hop k-1 nonempty."""
    rows = analytics3.copurchase_bfs(spark, sf_dir).collect()
    by_hop = {r["hops"]: r for r in rows}
    assert by_hop[0]["n_nodes"] == 1
    seen = sorted(by_hop)
    assert seen == list(range(len(seen)))  # contiguous frontier levels


def test_bfs_crafted_path_graph(spark):
    """A 5-node path graph seeded at its smallest vertex yields exactly
    one node per hop — pins min-dist semantics (no revisits)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], schema="a int, b int"
    )
    sym = edges.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        edges.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    seed = sym.agg(F.min("src").alias("v"))
    reached = seed.select("v", F.lit(0).alias("d"))
    for _ in range(1, analytics3._BFS_HOPS + 1):
        nbr = reached.join(sym, reached["v"] == sym["src"]).select(
            F.col("dst").alias("v"), (F.col("d") + 1).alias("d")
        )
        reached = reached.unionByName(nbr).groupBy("v").agg(F.min("d").alias("d"))
    got = {r["v"]: r["d"] for r in reached.collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_recursive_month_spine_is_gap_free(spark, sf_dir):
    rows = analytics3.recursive_month_revenue(spark, sf_dir).collect()
    months = [r["month"] for r in rows]
    assert months == sorted(months)
    for prev, cur in zip(months, months[1:]):
        assert (cur.year - prev.year) * 12 + (cur.month - prev.month) == 1
    # conservation: spine totals equal the plain aggregate
    o = analytics3.load_testdata(spark, sf_dir, tables=("orders",), register=False)[
        "orders"
    ]
    assert sum(r["n_orders"] for r in rows) == o.count()


def test_scd2_asof_one_row_per_active_user(spark, sf_dir):
    """The as-of snapshot has at most one interval per user (validity
    intervals partition each user's timeline), and every returned value
    matches some purchase of that user."""
    rows = analytics3.scd2_value_asof_midpoint(spark, sf_dir).collect()
    users = [r["user_id"] for r in rows]
    assert len(users) == len(set(users))
    assert rows, "midpoint snapshot should be non-empty at test SFs"
    ev = (
        analytics3._events(spark, sf_dir)
        .where((F.col("event_type") == "purchase") & (F.col("user_id") < 50))
        .select("user_id", F.round("value", 2).alias("v"))
    )
    have = {(r["user_id"], r["v"]) for r in ev.collect()}
    for r in rows:
        assert (r["user_id"], r["value_r2"]) in have


def test_group_split_is_leak_free_and_hash_faithful(spark, sf_dir):
    row = analytics3.group_split_leakage(spark, sf_dir).first()
    assert row["n_leaky_users"] == 0
    # python re-derivation of one side of the 80/20 hash split
    ev = analytics3._events(spark, sf_dir).select("user_id").distinct().collect()
    n_train = sum(
        1
        for r in ev
        if int(hashlib.md5(str(r["user_id"]).encode()).hexdigest()[:8], 16) % 100 < 80
    )
    assert row["n_train_users"] == n_train
    assert row["n_train_users"] + row["n_test_users"] == len(ev)


def test_kmeans_partitions_all_vectors_into_at_most_k_clusters(spark, sf_dir):
    rows = analytics3.kmeans_clusters(spark, sf_dir).collect()
    assert 1 <= len(rows) <= analytics3._KM_K
    e = analytics3.load_testdata(
        spark, sf_dir, tables=("embeddings",), register=False
    )["embeddings"]
    assert sum(r["n_vecs"] for r in rows) == e.count()
    for r in rows:
        assert r["inertia_milli2"] >= 0
        assert 0 <= r["cluster"] < analytics3._KM_K


def test_kmeans_beats_single_cluster_inertia(spark, sf_dir):
    """K=4 Lloyd inertia must be well below the 1-cluster (global
    integer-mean centroid) inertia — the sanity floor that catches a
    broken assignment step."""
    import pyspark.sql.functions as F

    rows = analytics3.kmeans_clusters(spark, sf_dir).collect()
    km_inertia = sum(r["inertia_milli2"] for r in rows)
    e = analytics3.load_testdata(
        spark, sf_dir, tables=("embeddings",), register=False
    )["embeddings"].select(F.expr(analytics3._MILLI_VEC).alias("q"))
    cent = (
        e.select(F.posexplode("q").alias("i", "x"))
        .groupBy("i")
        .agg(F.expr("sum(x) div count(1)").alias("comp"))
        .groupBy()
        .agg(
            F.expr(
                "transform(sort_array(collect_list(struct(i, comp))), s -> s.comp)"
            ).alias("cv")
        )
    )
    one = (
        e.crossJoin(F.broadcast(cent))
        .select(
            F.expr(
                "aggregate(zip_with(q, cv, (x, y) -> (x - y) * (x - y)),"
                " 0L, (a, x) -> a + x)"
            ).alias("d")
        )
        .agg(F.sum("d").alias("t"))
        .first()["t"]
    )
    assert km_inertia < one


def test_auc_matches_python_tie_averaged_recompute(spark, sf_dir):
    row = analytics3.classifier_auc(spark, sf_dir).first()
    assert 0 <= row["auc_micro"] <= 1_000_000
    ev = analytics3._events(spark, sf_dir).select(
        F.expr("CAST(round(value * 1000000.0, 0) AS BIGINT)").alias("s"),
        (F.col("event_type") == "purchase").cast("long").alias("p"),
    ).collect()
    scored = sorted((r["s"], r["p"]) for r in ev)
    # tie-averaged 2×ranks
    t2 = 0
    i = 0
    while i < len(scored):
        j = i
        while j < len(scored) and scored[j][0] == scored[i][0]:
            j += 1
        avg2 = (i + 1) + j  # 2 * average rank of the tie group [i+1 .. j]
        t2 += sum(avg2 for k in range(i, j) if scored[k][1] == 1)
        i = j
    n_pos = sum(p for _, p in scored)
    n_neg = len(scored) - n_pos
    expect = (1_000_000 * (t2 - n_pos * (n_pos + 1))) // (2 * n_pos * n_neg)
    assert row["auc_micro"] == expect
    assert (row["n_pos"], row["n_neg"]) == (n_pos, n_neg)


def test_calibration_bands_are_balanced_and_cover_all_rows(spark, sf_dir):
    rows = analytics3.score_calibration(spark, sf_dir).collect()
    assert [r["band"] for r in rows] == list(range(10))
    sizes = [r["n"] for r in rows]
    assert max(sizes) - min(sizes) <= 1  # equal-count bands
    total = analytics3._events(spark, sf_dir).count()
    assert sum(sizes) == total
    # mean score must be non-decreasing across rank bands
    means = [r["mean_score_micro"] for r in rows]
    assert means == sorted(means)


def test_ewma_planted_spike_flags(spark):
    """A flat series with one 10× spike must flag exactly that day —
    pins the Horner weight direction (newest previous day heaviest)."""
    import datetime as dt

    rows = [
        (dt.datetime(2024, 1, 1) + dt.timedelta(days=i, hours=1), "t")
        for i in range(20)
        for _ in range(100 if i != 15 else 1000)
    ]
    ev = spark.createDataFrame(rows, schema="ts timestamp_ntz, event_type string")
    import bigdatamanagement_spark.queries.analytics3 as a3

    orig = a3._events
    try:
        a3._events = lambda s, d: ev
        out = a3.ewma_volume_anomalies(spark, "ignored").collect()
    finally:
        a3._events = orig
    assert len(out) == 1
    r = out[0]
    assert r["n_anomalies"] == 1
    # spike day (index 15) has 15 days of history: excess =
    # 1000·(2^15−1) − 2·100·(2^15−1) = 800·(2^15−1)
    assert r["max_excess"] == 800 * (2**15 - 1)


def test_jl_projection_preserves_scaled_norms_on_average(spark, sf_dir):
    """E[‖proj‖²] = d_in/d_out · E[‖x‖²] for ±1 JL matrices — check the
    aggregate variance mass is within 2× of that expectation (loose
    band; the identity is exact only in expectation)."""
    out = {r["out_dim"]: r for r in analytics3.embedding_jl_projection(
        spark, sf_dir
    ).collect()}
    assert sorted(out) == list(range(analytics3._JL_OUT))
    e = analytics3.load_testdata(
        spark, sf_dir, tables=("embeddings",), register=False
    )["embeddings"]
    raw_ss = e.select(
        F.expr(
            "aggregate(transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)"
            " * 1000.0, 0) AS BIGINT)), 0L, (a, x) -> a + x * x)"
        ).alias("ss")
    ).agg(F.sum("ss").alias("t")).first()["t"]
    proj_ss = sum(r["sumsq_proj"] for r in out.values())
    # Σ_j E[p_j²] per vector = Σ_i q_i² · d_out  ⇒ totals ratio ≈ d_out
    ratio = proj_ss / (raw_ss * analytics3._JL_OUT)
    assert 0.5 < ratio < 2.0, ratio


def test_quantile_normalization_equalizes_marginals(spark, sf_dir):
    """After normalization every type's mean must sit near the pooled
    mean (the whole point of quantile normalization), and the max
    normalized value of the largest-rank type equals the pooled max."""
    rows = analytics3.quantile_normalize_values(spark, sf_dir).collect()
    assert rows
    means = [r["sum_norm_micro"] / r["n"] for r in rows]
    spread = max(means) - min(means)
    ev = analytics3._events(spark, sf_dir).select(
        F.expr("CAST(round(value * 1000000.0, 0) AS BIGINT)").alias("v")
    )
    agg = ev.agg(
        F.mean("v").alias("m"), F.stddev("v").alias("s"), F.max("v").alias("mx")
    ).first()
    # equal marginals ⇒ per-type means within a small fraction of σ
    assert spread < 0.1 * agg["s"], (spread, agg["s"])
    assert max(r["max_norm_micro"] for r in rows) == agg["mx"]


def test_rolling_origin_never_leaks_future_into_train(spark, sf_dir):
    rows = analytics3.rolling_origin_splits(spark, sf_dir).collect()
    assert [r["fold"] for r in rows] == list(range(1, analytics3._CV_FOLDS + 1))
    for r in rows:
        assert r["train_last_us"] < r["test_first_us"]  # temporal boundary
        assert r["n_train"] > 0 and r["n_test"] > 0
    # expanding window: train grows monotonically
    trains = [r["n_train"] for r in rows]
    assert trains == sorted(trains) and trains[0] < trains[-1]


def test_winsorized_mean_is_bounded_by_fences_and_robust(spark, sf_dir):
    rows = {r["event_type"]: r for r in
            analytics3.winsorized_mean_by_type(spark, sf_dir).collect()}
    ev = analytics3._events(spark, sf_dir).select(
        "event_type", F.expr("CAST(round(value * 1000000.0, 0) AS BIGINT)").alias("v")
    )
    raw = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()
    }
    for t, r in rows.items():
        assert r["n"] == raw[t]["n"]  # winsorization keeps every row
        assert raw[t]["lo"] <= r["wmean_floor_micro"] <= raw[t]["hi"]
