"""Co-listen recommendation operator — the reference's most complex SQL
(Assignment 1 ipynb cells 17-21), generalized.

Modes:
- co-listen (``same_day=False``): song pairs shared by > ``min_users``
  distinct users; recommend the pair's other song to every listener of
  the first who hasn't heard it (ipynb:1470-1546).
- same-day (``same_day=True``): pairs of listens by different users on
  the same calendar day; recommend the other user's song
  (ipynb:1662-1700).

Both end with a left_anti join replacing SQL ``NOT IN`` (valid because
listens.song_id is non-null — asserted by the fixture loader; SURVEY
§5.3 NULL trap).

Scale notes: the self-join keys on user_id (co-listen) or listen date
(same-day) — both skew-prone (power users / busy days); AQE skew-join
handles splitting. The pair aggregation is a hash agg with map-side
partial count(distinct) expansion; at 100 TB the same-day mode should be
pre-bucketed by date.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def colisten_recommend(
    listens: DataFrame, min_users: int = 1, same_day: bool = False
) -> DataFrame:
    """Return distinct ``(user_id, song_id)`` recommendations."""
    l1, l2 = listens.alias("l1"), listens.alias("l2")
    if same_day:
        pairs = (
            l1.join(
                l2,
                (F.to_date("l1.listen_time") == F.to_date("l2.listen_time"))
                & (F.col("l1.user_id") != F.col("l2.user_id")),
            )
            .filter(F.col("l1.listen_time").isNotNull() & F.col("l2.listen_time").isNotNull())
            .select(
                F.col("l1.user_id").alias("user_id"),
                F.col("l2.song_id").alias("song_id"),
            )
            .distinct()
        )
        candidates = pairs
    else:
        similarity = (
            l1.join(
                l2,
                (F.col("l1.user_id") == F.col("l2.user_id"))
                & (F.col("l1.song_id") != F.col("l2.song_id")),
            )
            .groupBy(
                F.col("l1.song_id").alias("song1"),
                F.col("l2.song_id").alias("song2"),
            )
            .agg(F.countDistinct("l1.user_id").alias("common_users"))
            .filter(F.col("common_users") > min_users)
        )
        candidates = (
            similarity.join(listens.alias("l"), F.col("l.song_id") == F.col("song1"))
            .select(F.col("l.user_id").alias("user_id"), F.col("song2").alias("song_id"))
            .distinct()
        )
    heard = listens.select("user_id", "song_id")
    return candidates.join(heard, ["user_id", "song_id"], "left_anti")


def with_recommendation_ids(
    recs: DataFrame, start_id: int = 0, frozen_time: str = "2024-09-01 00:00:00"
) -> DataFrame:
    """Attach generated ids + timestamp (ipynb:1536-1542, Q-W01).

    The reference uses ``ROW_NUMBER() OVER ()`` (arbitrary order) +
    ``strftime('now')``; the engine pins a deterministic ORDER BY and a
    frozen clock (SURVEY §5.3). The unpartitioned window is fine here:
    id generation runs on the final small recommendation set.
    """
    w = Window.orderBy("user_id", "song_id")
    return recs.select(
        (F.lit(start_id) + F.row_number().over(w)).alias("recommendation_id"),
        "user_id",
        "song_id",
        F.lit(frozen_time).cast("timestamp_ntz").alias("recommendation_time"),
    )
