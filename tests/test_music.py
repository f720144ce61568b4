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
    """FIXTURES §E: same-day recommendations are empty."""
    assert music.same_day_recs(spark, sf_dir).count() == 0


def test_t11_golden(spark, sf_dir):
    rows = music.minnie_recs(spark, sf_dir).collect()
    assert sorted(r.title for r in rows) == ["Evermore", "Yesterday"]
