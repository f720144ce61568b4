"""Oracle + semantics tests for the advanced-analytics pack
(queries/analytics.py): RANGE frames, ntile banding, sliding distinct,
IQR fences, chunk dedup, stratified sampling, unpivot, PMI."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bigdatamanagement_spark.queries import analytics
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics.ORACLE))
def test_analytics_oracle(spark, duck, sf_dir, name):
    df = analytics.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics.ORACLE[name])


def test_trailing_hour_includes_self_only_at_gap(spark, sf_dir):
    """An event ≥1h after its user's previous one counts only itself."""
    out = analytics.trailing_hour_value(spark, sf_dir)
    solo = out.filter(F.col("n_trailing") == 1).count()
    assert solo >= 1  # sparse users exist at every SF


def test_decile_bands_cover_and_order(spark, sf_dir):
    rows = analytics.value_decile_bands(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        assert [r["decile"] for r in rs] == list(range(1, 11)), t
        # band edges are monotone and the last band reaches 10000 bp
        for a, b in zip(rs, rs[1:]):
            assert a["hi_bp"] <= b["lo_bp"]
        assert rs[-1]["hi_bp"] == 10000
        # ntile balance: sizes differ by at most 1
        sizes = [r["n"] for r in rs]
        assert max(sizes) - min(sizes) <= 1


def test_rolling_7d_upper_bounds_daily_active(spark, sf_dir):
    """Trailing-7d actives ≥ same-day actives, and the grid is dense."""
    ev = analytics._events(spark, sf_dir)
    daily = (
        ev.select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n1"))
    )
    roll = analytics.rolling_7d_active_users(spark, sf_dir)
    joined = roll.join(daily, "day", "left").collect()
    days = sorted(r["day"] for r in joined)
    assert (days[-1] - days[0]).days + 1 == len(days)
    for r in joined:
        assert r["active_users_7d"] >= (r["n1"] or 0)


def test_chunk_dedup_flags_planted_duplicate(spark, tmp_path):
    """Two docs sharing an exact 10-token span are both flagged; a doc
    with unique text is not."""
    span = " ".join(f"w{i}" for i in range(10))
    rows = [
        (1, span + " alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, span + " one two three four five six seven eight nine ten"),
        (3, " ".join(f"u{i}" for i in range(20))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    p = str(tmp_path / "documents.parquet")
    docs.withColumn("lang", F.lit("en")).withColumn("source", F.lit("s")).withColumn(
        "n_chars", F.length("text")
    ).write.parquet(p)
    out = {
        r["doc_id"]: r
        for r in analytics.chunk_dup_spans(spark, str(tmp_path)).collect()
    }
    assert out[1]["n_dup_chunks"] == 1 and out[2]["n_dup_chunks"] == 1
    assert out[3]["n_dup_chunks"] == 0
    assert out[3]["surviving_tokens"] == 20


def test_stratified_sample_bounds_and_determinism(spark, sf_dir):
    a = analytics.stratified_sample(spark, sf_dir).collect()
    b = analytics.stratified_sample(spark, sf_dir).collect()
    assert a == b
    per = {}
    for r in a:
        per[(r["lang"], r["source"])] = per.get((r["lang"], r["source"]), 0) + 1
    assert all(v <= analytics.SAMPLE_PER_STRATUM for v in per.values())


def test_unpivot_roundtrips_pivot_mass(spark, sf_dir):
    from bigdatamanagement_spark.queries.events import EVENT_TYPES, hourly_type_pivot

    wide = hourly_type_pivot(spark, sf_dir)
    long = analytics.unpivot_hourly_matrix(spark, sf_dir)
    wide_sum = wide.select(
        sum([F.sum(t) for t in EVENT_TYPES], F.lit(0.0)).alias("s")
    ).collect()[0]["s"]
    long_sum = long.agg(F.sum("sum_value").alias("s")).collect()[0]["s"]
    assert abs(wide_sum - long_sum) < 1e-6
    assert long.count() == wide.count() * len(EVENT_TYPES)


def test_weighted_sample_prefers_heavy_docs(spark, sf_dir):
    """The weighted sample's mean weight exceeds the corpus mean weight
    (the point of weighting), and ranks are 1..k."""
    out = analytics.weighted_sample(spark, sf_dir).collect()
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))
    docs = analytics._documents(spark, sf_dir)
    corpus_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    sample_mean = sum(r["weight"] for r in out) / len(out)
    assert sample_mean > corpus_mean


def test_corr_bounds(spark, sf_dir):
    for r in analytics.corr_value_vs_prop(spark, sf_dir).collect():
        assert -1.0 <= r["pearson_r"] <= 1.0


def test_chi2_nonnegative_and_dof(spark, sf_dir):
    row = analytics.chi2_lang_source(spark, sf_dir).collect()[0]
    assert row["chi2_micro"] >= 0
    assert row["dof"] >= 1


def test_bigram_jaccard_bounds(spark, sf_dir):
    rows = analytics.source_bigram_jaccard(spark, sf_dir).collect()
    for r in rows:
        assert 0 <= r["jaccard_bp"] <= 10000
        assert r["inter"] <= r["uni"]
        assert r["src_a"] < r["src_b"]


def test_debounce_keeps_first_and_bounds_gaps(spark, sf_dir):
    for r in analytics.event_debounce_summary(spark, sf_dir).collect():
        assert 1 <= r["n_kept"] <= r["n_events"]
        if r["min_dropped_gap_us"] is not None:
            assert r["min_dropped_gap_us"] <= analytics.DEBOUNCE_US
            assert r["max_dropped_gap_us"] <= analytics.DEBOUNCE_US


def test_ols_slope_sign_matches_pearson(spark, sf_dir):
    slopes = {
        r["event_type"]: r["slope_centi_floor"]
        for r in analytics.ols_value_on_prop(spark, sf_dir).collect()
    }
    rs = {
        r["event_type"]: r["pearson_r"]
        for r in analytics.corr_value_vs_prop(spark, sf_dir).collect()
    }
    for t, slope in slopes.items():
        if abs(rs[t]) > 0.01:
            # floor() shifts negatives down by one — compare loosely at 0
            assert (slope >= -1) == (rs[t] > 0) or abs(slope) <= 1


def test_bpe_merge_table_memo_equals_direct_train(spark):
    """The memoized merge-table rows (ext_bpe_merge_table's model memo)
    must equal the direct bpe_train plan row-for-row, types included —
    the equivalence the round-7 train-once memo rests on."""
    import pyspark.sql.functions as F

    from bigdatamanagement_spark.operators.bpe import bpe_train
    from bigdatamanagement_spark.queries.analytics import (
        BPE_ROUNDS,
        _documents,
        bpe_merge_table,
    )

    sf = "/root/testdata/sf0.01"
    docs = _documents(spark, sf)
    vocab = (
        docs.select(
            F.explode(F.split(F.lower(F.trim("text")), "\\s+")).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    direct = bpe_train(vocab, rounds=BPE_ROUNDS)
    memo = bpe_merge_table(spark, sf)
    assert memo.dtypes == direct.dtypes
    assert [tuple(r) for r in memo.collect()] == [
        tuple(r) for r in direct.collect()
    ]


def test_bpe_planted_vocab_learns_expected_merges(spark):
    """'abab'×10 + 'ab'×5: round 1 merges (a,b) [cnt 25], round 2 merges
    (ab,ab) [cnt 10] — merged symbols must participate in later rounds,
    and greedy left-to-right must not double-count overlaps."""
    from bigdatamanagement_spark.operators.bpe import bpe_train

    vocab = spark.createDataFrame(
        [("abab", 10), ("ab", 5)], "token string, freq long"
    )
    rows = bpe_train(vocab, rounds=2).collect()
    assert (rows[0]["sym_a"], rows[0]["sym_b"], rows[0]["cnt"]) == ("a", "b", 25)
    assert (rows[1]["sym_a"], rows[1]["sym_b"], rows[1]["cnt"]) == ("ab", "ab", 10)


def test_bpe_greedy_nonoverlap(spark):
    """'aaa'×1: pair (a,a) counts twice pre-merge but merges once
    (left-to-right greedy) — round 2 sees [aa, a]."""
    from bigdatamanagement_spark.operators.bpe import bpe_train

    vocab = spark.createDataFrame([("aaa", 1)], "token string, freq long")
    rows = bpe_train(vocab, rounds=2).collect()
    assert (rows[0]["sym_a"], rows[0]["sym_b"], rows[0]["cnt"]) == ("a", "a", 2)
    assert (rows[1]["sym_a"], rows[1]["sym_b"], rows[1]["cnt"]) == ("aa", "a", 1)


def test_global_running_max_crafted_out_of_order(spark):
    """Planted late arrivals: the distributed two-phase running max
    equals the one-partition window result, and lateness is non-zero
    exactly for the out-of-order rows."""
    import pyspark.sql.functions as F

    from bigdatamanagement_spark.operators.rank import global_running_max

    # arrival order 1..6; event times jump back at arrivals 3 and 5
    rows = [(1, 100), (2, 200), (3, 150), (4, 300), (5, 120), (6, 400)]
    df = spark.createDataFrame(rows, "event_id long, us long").repartition(4)
    out = {
        r["event_id"]: r["running_max"]
        for r in global_running_max(df, "event_id", "us").collect()
    }
    assert out == {1: 100, 2: 200, 3: 200, 4: 300, 5: 300, 6: 400}
    late = {eid: out[eid] - us for eid, us in rows}
    assert late == {1: 0, 2: 0, 3: 50, 4: 0, 5: 180, 6: 0}


def test_portable_hll_accuracy(spark, sf_dir):
    """HLL(m=64) standard error is 1.04/√64 ≈ 13%; assert within 25%
    of exact on every group (linear counting keeps small groups tight)."""
    for r in analytics.portable_hll_users_by_type(spark, sf_dir).collect():
        err = abs(r["hll_estimate"] - r["exact_distinct"]) / r["exact_distinct"]
        assert err <= 0.25, (r, err)


def test_weighted_median_is_weighted_center(spark, sf_dir):
    """At least half the total weight sits at or below the reported
    weighted median, and strictly less than half below it."""
    import pyspark.sql.functions as Fn

    ev = analytics._events(spark, sf_dir)
    w = Fn.get_json_object("props", "$.k").cast("long")
    rows = ev.select(
        "event_type",
        Fn.round(Fn.col("value") * 1000000.0, 0).cast("long").alias("v"),
        w.alias("wt"),
    ).filter(Fn.col("wt") > 0)
    med = {
        r["event_type"]: r["wmedian_micro"]
        for r in analytics.weighted_median_value(spark, sf_dir).collect()
    }
    for t, m in med.items():
        sub = rows.filter(Fn.col("event_type") == t)
        tot = sub.agg(Fn.sum("wt")).collect()[0][0]
        le = sub.filter(Fn.col("v") <= m).agg(Fn.sum("wt")).collect()[0][0]
        lt = sub.filter(Fn.col("v") < m).agg(Fn.sum("wt")).collect()[0][0] or 0
        assert 2 * le >= tot, (t, le, tot)
        assert 2 * lt < tot, (t, lt, tot)


def test_hll_union_on_disjoint_sets(spark):
    """Planted disjoint key sets: union estimate ≈ |A|+|B| and the
    merged registers equal a sketch built over the concatenation —
    mergeability, non-vacuously."""
    import pyspark.sql.functions as Fn

    from bigdatamanagement_spark.operators.sketch import (
        hll_estimate_from_registers,
        portable_hll_registers,
    )

    a = spark.range(0, 400).select(Fn.col("id").alias("k"))
    b = spark.range(10000, 10600).select(Fn.col("id").alias("k"))
    ra = portable_hll_registers(a, "k", [])
    rb = portable_hll_registers(b, "k", [])
    merged = ra.unionAll(rb).groupBy("reg").agg(Fn.max("r").alias("r"))
    direct = portable_hll_registers(a.unionAll(b), "k", [])
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))
    est = hll_estimate_from_registers(merged, []).collect()[0][0]
    assert abs(est - 1000) / 1000 < 0.30, est


def test_rolling_hll_tracks_exact(spark, sf_dir):
    """The sketch path stays within HLL error of the exact expansion on
    every window-end day."""
    ex = {
        r["day"]: r["active_users_7d"]
        for r in analytics.rolling_7d_active_users(spark, sf_dir).collect()
    }
    ap = {
        r["day"]: r["hll_active_7d"]
        for r in analytics.rolling_7d_hll_users(spark, sf_dir).collect()
    }
    assert set(ex) == set(ap)
    for d, v in ex.items():
        assert abs(ap[d] - v) <= max(0.25 * v, 3), (d, v, ap[d])


def test_histogram_quantile_error_bounded_by_bucket_width(spark, sf_dir):
    """The histogram lower bound brackets the SAME-RANK order statistic
    (smallest v with cum·den ≥ n·num — the discrete rank rule the
    sketch discretizes): lb ≤ v_rank < lb + bucket width. Comparing to
    interpolated quantiles instead is wrong at small n, where disc and
    cont ranks straddle a tail gap."""
    width = analytics.HIST_MAX_MICRO / analytics.HIST_BUCKETS / 1e6
    vals: dict[str, list[float]] = {}
    for r in analytics._events(spark, sf_dir).select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    approx = {
        r["event_type"]: (
            r["p50_lb_micro"] / 1e6,
            r["p90_lb_micro"] / 1e6,
            r["p99_lb_micro"] / 1e6,
        )
        for r in analytics.histogram_quantiles(spark, sf_dir).collect()
    }
    for t, vs in vals.items():
        vs.sort()
        n = len(vs)
        for (num, den), a in zip([(1, 2), (9, 10), (99, 100)], approx[t]):
            # smallest 1-based rank r with r*den >= n*num
            r = (n * num + den - 1) // den
            ref = vs[r - 1]
            assert a <= ref + 1e-9, (t, num, den, ref, a)
            assert ref - a <= width + 1e-9, (t, num, den, ref, a)


def test_pmi_symmetric_input_invariance(spark, sf_dir):
    """PMI pairs are canonically ordered (tok_a < tok_b) and every
    pair's counts respect c_xy <= min(df_a, df_b)."""
    rows = analytics.token_pmi_pairs(spark, sf_dir).collect()
    assert rows, "top-50 vocabulary should co-occur at every SF"
    for r in rows:
        assert r["tok_a"] < r["tok_b"]
