"""Golden oracle tests for the KV/leaderboard pack (T15)."""

import pytest

from bigdatamanagement_spark.queries import kv
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(kv.QUERIES))
def test_kv_oracle(spark, duck, sf_dir, name):
    df = kv.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, kv.ORACLE[name])


def test_q5_returns_10_with_ties_broken(spark, sf_dir):
    rows = kv.top10_leaderboard_emails(spark, sf_dir).collect()
    assert len(rows) == 10
    # scores non-increasing; ties broken by user_id asc
    for a, b in zip(rows, rows[1:]):
        assert (a.score, ) >= (b.score, )
        if a.score == b.score:
            assert a.user_id < b.user_id


def test_q4_filter_has_matches(spark, sf_dir):
    """FIXTURES §C2 constraint: females in China/Russia at lat 40-46 exist."""
    assert kv.female_china_russia(spark, sf_dir).count() > 0


def test_zinter_recent_top10_nonvacuous(spark, sf_dir):
    rows = kv.zinter_recent_top10(spark, sf_dir).collect()
    assert len(rows) == 10  # the intersection has ≥10 members (408 observed)
    for a, b in zip(rows, rows[1:]):
        assert (a.zscore,) >= (b.zscore,)
        if a.zscore == b.zscore:
            assert a.user_id < b.user_id


def test_zunion_weighted_both_branch_on_crafted_sets(spark):
    """The fixture's leaderboards are disjoint, so pin the 'both'
    membership class (max of weighted scores) on a crafted frame."""
    import pyspark.sql.functions as F

    s = spark.createDataFrame(
        [("u1", 10, "leaderboard:2"), ("u1", 30, "leaderboard:3"),
         ("u2", 5, "leaderboard:2")],
        schema="user_id string, score int, leaderboard string",
    )
    agg = s.groupBy("user_id").agg(
        F.max(F.when(F.col("leaderboard") == "leaderboard:2", 2 * F.col("score"))).alias("w2"),
        F.max(F.when(F.col("leaderboard") == "leaderboard:3", F.col("score"))).alias("w3"),
    )
    got = {
        r["user_id"]: (r["w2"], r["w3"])
        for r in agg.collect()
    }
    assert got == {"u1": (20, 30), "u2": (10, None)}


def test_geo_grid_cells_partition_all_users(spark, sf_dir):
    """Grid cells are a partition: summed top-20 ≤ total, and every
    cell id decodes to a valid (lat, lon) 2° cell."""
    rows = kv.geo_grid_density(spark, sf_dir).collect()
    total = kv.tables(spark)["users"].count()
    assert 0 < sum(r["n_users"] for r in rows) <= total
    for r in rows:
        lat_band, lon_band = divmod(r["cell_id"], 180)
        assert 0 <= lat_band < 90 and 0 <= lon_band < 180
        # cell centroid from the checksums falls inside the cell bounds
        lat_c = r["lat_sum_e4"] / r["n_users"] / 10000
        assert (lat_band * 2 - 90) <= lat_c <= (lat_band * 2 - 88)


def test_ip_block_majority_is_argmax(spark, sf_dir):
    import pyspark.sql.functions as F

    rows = kv.ip_block_country_audit(spark, sf_dir).collect()
    assert rows
    u = kv.tables(spark)["users"].select(
        F.split(F.col("ip_address"), r"\.").getItem(0).cast("int").alias("block"),
        "country",
    )
    # verify one block's majority by recount
    b = rows[0]
    counts = {
        r["country"]: r["c"]
        for r in u.filter(F.col("block") == b["block"])
        .groupBy("country")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    best = sorted(counts.items(), key=lambda kv_: (-kv_[1], kv_[0]))[0][0]
    assert b["majority_country"] == best
    assert b["n_mismatch"] == b["n_users"] - counts[best]


def test_k_anonymity_monotone_in_k(spark, sf_dir):
    rows = {r["k"]: r for r in kv.k_anonymity_audit(spark, sf_dir).collect()}
    assert sorted(rows) == [2, 5, 10]
    # risk is monotone in k; class counts constant; min size consistent
    assert (rows[2]["n_classes_below_k"] <= rows[5]["n_classes_below_k"]
            <= rows[10]["n_classes_below_k"])
    assert len({r["n_classes"] for r in rows.values()}) == 1
    assert len({r["min_class_size"] for r in rows.values()}) == 1
    total = kv.tables(spark)["users"].count()
    for r in rows.values():
        assert 0 <= r["n_users_at_risk"] <= total
