"""Oracle + semantics tests for the graph-peeling / MDM /
BI-decomposition pack (queries/analytics7.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics7
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics7.ORACLE))
def test_analytics7_oracle(spark, duck, sf_dir, name):
    df = analytics7.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics7.ORACLE[name])


def test_kcore_peeling_is_monotone(spark, sf_dir):
    rows = {r["round"]: r for r in analytics7.kcore_decomposition(spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 3}
    for r in (2, 3):
        assert rows[r]["n_vertices"] <= rows[r - 1]["n_vertices"]
        assert rows[r]["n_edges"] <= rows[r - 1]["n_edges"]
    for r in rows.values():  # a k-core survivor keeps >= k neighbors ⇒
        # edges >= k*v/2 whenever the core is nonempty and stable
        assert r["n_edges"] >= 0 and r["n_vertices"] >= 0


def test_golden_record_clusters_via_union_find(spark, duck, sf_dir):
    """Recompute the fuzzy clusters with a python union-find and check
    cluster count + membership sizes + the max-balance rule."""
    pairs = duck.execute(
        """
        SELECT a.c_custkey, b.c_custkey
        FROM customer a JOIN customer b
          ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 2
        """
    ).fetchall()
    custs = dict(
        duck.execute(
            "SELECT c_custkey, CAST(round(c_acctbal * 100, 0) AS BIGINT) "
            "FROM customer"
        ).fetchall()
    )
    parent = {k: k for k in custs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters: dict[int, list[int]] = {}
    for k in custs:
        clusters.setdefault(find(k), []).append(k)
    want = {
        min(v): (len(v), max(custs[m] for m in v))
        for v in clusters.values()
        if len(v) >= 2
    }
    got = {
        r["golden_id"]: (r["n_members"], r["best_acctbal_cents"])
        for r in analytics7.golden_record_merge(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_mix_shift_effects_sum_to_delta(spark, sf_dir):
    rows = analytics7.mix_shift_decomposition(spark, sf_dir).collect()
    assert rows
    for r in rows:
        s = (
            r["volume_effect_cents"]
            + r["rate_effect_cents"]
            + r["interaction_cents"]
        )
        # the identity is exact in reals; each of 3 terms rounds by <=0.5
        assert abs(s - r["delta_cents"]) <= 2
        assert r["n1"] > 0 and r["n2"] > 0


def test_builtin_session_window_equals_sessionize(spark, sf_dir):
    import pyspark.sql.functions as F

    from bigdatamanagement_spark.operators.sessionize import session_bounds

    ev = analytics7._events(spark, sf_dir)
    ours = (
        session_bounds(ev, "user_id", "ts", 1800, order_tiebreak="event_id")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("duration_us").cast("long").alias("sum_duration_us"),
        )
    )
    want = {r["user_id"]: (r["n_sessions"], r["n_events"], r["sum_duration_us"])
            for r in ours.collect()}
    got = {r["user_id"]: (r["n_sessions"], r["n_events"], r["sum_duration_us"])
           for r in analytics7.builtin_session_window_stats(spark, sf_dir).collect()}
    assert got == want
