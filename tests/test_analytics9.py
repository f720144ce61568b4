"""Oracle + semantics tests for the spatial-clustering / robust-trend
/ link-prediction pack (queries/analytics9.py)."""

from __future__ import annotations

import pytest

from bigdatamanagement_spark.queries import analytics9
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics9.ORACLE))
def test_analytics9_oracle(spark, duck, sf_dir, name):
    df = analytics9.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, analytics9.ORACLE[name])


def test_hotspot_clusters_partition_users(spark, sf_dir):
    """Clusters partition the dense cells: user totals add up to the
    dense-cell user total, and bounding boxes are self-consistent."""
    import duckdb

    from bigdatamanagement_spark.fixtures import fixture_path

    rows = analytics9.geo_hotspot_clusters(spark, sf_dir).collect()
    assert rows
    dense_total = duckdb.sql(
        f"""SELECT SUM(n) FROM (
            SELECT COUNT(*) AS n FROM read_parquet('{fixture_path("kv_users")}')
            GROUP BY CAST(floor((latitude + 90) / 2) AS BIGINT),
                     CAST(floor((longitude + 180) / 2) AS BIGINT)
            HAVING COUNT(*) >= {analytics9._DENSE_MIN_USERS})"""
    ).fetchone()[0]
    assert sum(r["n_users"] for r in rows) == dense_total
    for r in rows:
        assert r["r_min"] <= r["r_max"] and r["c_min"] <= r["c_max"]
        assert r["n_cells"] >= 1 and r["n_users"] >= analytics9._DENSE_MIN_USERS


def test_theil_sen_python_recount(spark, duck, sf_dir):
    days = duck.execute(
        "SELECT CAST(ts AS DATE) AS day, COUNT(*) FROM events GROUP BY 1 "
        "ORDER BY 1"
    ).fetchall()
    xs = [x for _, x in days]
    slopes = sorted(
        (xs[j] - xs[i]) / (j - i)
        for i in range(len(xs))
        for j in range(i + 1, len(xs))
    )
    m = len(slopes)
    want = (slopes[(m + 1) // 2 - 1] + slopes[m // 2]) / 2.0
    got = analytics9.theil_sen_trend(spark, sf_dir).collect()[0]
    assert got["n_pairs"] == m and got["n_days"] == len(xs)
    assert got["slope_per_day"] == want


def test_link_prediction_excludes_existing_edges(spark, sf_dir):
    from bigdatamanagement_spark.queries.analytics7 import _copurchase_edges

    edges = {
        (r["a"], r["b"])
        for r in _copurchase_edges(spark, sf_dir).collect()
    }
    rows = analytics9.link_prediction(spark, sf_dir).collect()
    assert 0 < len(rows) <= analytics9._LINK_TOP_K
    for r in rows:
        assert (r["a"], r["b"]) not in edges and r["a"] < r["b"]
        assert r["common_neighbors"] >= 1
        assert r["adamic_adar_micro"] >= r["common_neighbors"]  # ln(deg)<1e6


def test_closest_pair_symmetric_sanity(spark, sf_dir):
    rows = analytics9.closest_pair_by_country(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["ua"] < r["ub"] and r["dist_m"] >= 0 and r["n_pairs"] >= 1


def test_fano_positive(spark, sf_dir):
    rows = analytics9.fano_daily_dispersion(spark, sf_dir).collect()
    assert {r["event_type"] for r in rows} >= {"click", "purchase"}
    for r in rows:
        assert r["fano"] >= 0.0 and r["n_days"] > 1


def test_group_by_all_plans_like_explicit(spark, sf_dir):
    """GROUP BY ALL must produce the same result as the explicit key
    list (Catalyst resolves ALL at analysis time)."""
    got = analytics9.group_by_all_surface(spark, sf_dir).collect()
    explicit = spark.sql(
        analytics9._GBA_SQL.replace("GROUP BY ALL",
                                    "GROUP BY o_orderstatus, o_orderpriority")
    ).collect()
    assert got == explicit and len(got) > 0
