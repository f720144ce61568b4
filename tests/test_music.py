"""Golden oracle + reference-derived value tests for the music pack."""

import pytest

from bigdatamanagement_spark.queries import music
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(music.QUERIES))
def test_music_oracle(spark, duck, sf_dir, name):
    df = music.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, music.ORACLE[name])


def test_listens_songid_nonnull_invariant(spark):
    """NOT IN ≡ left_anti requires non-null song_id (SURVEY §5.3)."""
    t = music.tables(spark)
    assert t["listens"].filter("song_id IS NULL").count() == 0


def test_t09_golden(spark, sf_dir):
    """FIXTURES §E: only Minnie (user 2) gets recs — songs {1, 6}."""
    rows = music.colisten_recs(spark, sf_dir).collect()
    got = sorted((r.user_id, r.song_id) for r in rows)
    assert got == [(2, 1), (2, 6)]


def test_t10_golden_empty(spark, sf_dir):
    """FIXTURES §E: same-day recommendations are empty (matches the
    reference's own cell-21 output on its fixture)."""
    assert music.same_day_recs(spark, sf_dir).count() == 0


def test_t10b_golden_nonempty(spark, sf_dir):
    """The same-day operator on the sameday fixture variant yields a
    pinned NON-EMPTY golden — the vacuity guard for Q-J08."""
    rows = music.same_day_recs_active(spark, sf_dir).collect()
    got = sorted((r.user_id, r.song_id) for r in rows)
    assert got == [(1, 3), (1, 4), (2, 5), (2, 6), (3, 7), (4, 1)]


def test_same_day_crafted_case(spark):
    """Crafted case distinguishing the failure modes a 0-row golden
    cannot: date truncation (23:59 vs 00:05 next day), join direction
    (asymmetric already-heard sets), and the NULL-timestamp guard."""
    from bigdatamanagement_spark.operators.recommend import colisten_recommend

    listens = spark.createDataFrame(
        [
            # u1 and u2 share 2024-01-01 (different clock times)
            (1, 1, 10, 5.0, "2024-01-01 23:59:00"),
            (2, 2, 20, 4.0, "2024-01-01 00:05:00"),
            # u3's listen is 00:05 the NEXT day — same-day only if
            # truncation is wrong
            (3, 3, 30, 3.0, "2024-01-02 00:05:00"),
            # u2 already heard song 10 (kills the u2<-10 rec, keeps u1<-20)
            (4, 2, 10, 4.5, None),
            # NULL timestamps never pair
            (5, 4, 40, 2.0, None),
        ],
        "listen_id int, user_id int, song_id int, rating double, listen_time string",
    ).selectExpr(
        "listen_id",
        "user_id",
        "song_id",
        "rating",
        "CAST(listen_time AS TIMESTAMP) AS listen_time",
    )
    rows = colisten_recommend(listens, same_day=True).collect()
    got = sorted((r.user_id, r.song_id) for r in rows)
    # u1 gets 20; u2's rec of 10 is filtered (already heard); u3/u4 none
    assert got == [(1, 20)]


def test_t11_golden(spark, sf_dir):
    rows = music.minnie_recs(spark, sf_dir).collect()
    assert sorted(r.title for r in rows) == ["Evermore", "Yesterday"]
