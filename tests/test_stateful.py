"""applyInPandasWithState: running totals must converge to the batch agg."""

import pyspark.sql.functions as F

from bigdatamanagement_spark.streaming.stateful import running_user_totals
from bigdatamanagement_spark.streaming.windows import stream_events


def test_running_totals_converge_to_batch(spark, sf_dir):
    stream = running_user_totals(stream_events(spark, sf_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last emitted row per user = final running state
    got = {
        r.user_id: (round(r.total_value, 2), r.n_events)
        for r in spark.table("user_totals").collect()
    }
    want = {
        r.user_id: (r.total, r.n)
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 2).alias("total"), F.count("*").alias("n"))
        .collect()
    }
    # keep only each user's final update (memory sink appends every batch's emission)
    assert set(got) == set(want)
    # single-file availableNow => one batch => emitted == final
    assert got == want


def test_idle_session_timeout_boundary_is_strict(spark, tmp_path):
    """EventTimeTimeout fires iff watermark > deadline STRICTLY: a tail
    whose deadline equals the final watermark must NOT emit; one
    MILLISECOND past it must (the watermark is ms-granular: a +1us nudge
    truncates away). This pins the ms-floored `<` in the driver oracle."""
    import datetime as dt
    import shutil

    from bigdatamanagement_spark.streaming.stateful import idle_session_finalizer
    from bigdatamanagement_spark.streaming.windows import stream_events

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "a", 1.0, "{}"),
        # watermark = this ts - 30min; user1 deadline = t0 + 10min gap
        (2, t0 + dt.timedelta(minutes=40), 2, "a", 1.0, "{}"),
        (3, t0 + dt.timedelta(minutes=40, milliseconds=1), 3, "a", 1.0, "{}"),
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    for case, upto, expect_user1 in (("eq", 2, False), ("gt", 3, True)):
        d = tmp_path / case
        (d / "final").mkdir(parents=True)
        spark.createDataFrame(rows[:upto], schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(d / "x"))
        src = next((d / "x").glob("*.parquet"))
        shutil.copy(src, d / "final" / "events.parquet")
        q = (
            idle_session_finalizer(stream_events(spark, str(d / "final")))
            .writeStream.format("memory")
            .queryName(f"idle_edge_{case}")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {r.user_id for r in spark.table(f"idle_edge_{case}").collect()}
        assert (1 in got) == expect_user1, case


def test_idle_sessions_match_batch_sessionization(spark, sf_dir, duck):
    from bigdatamanagement_spark.queries import streaming_pack as SP
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(
        SP.QUERIES["ext_streaming_idle_sessions"](spark, sf_dir),
        duck,
        SP.ORACLE["ext_streaming_idle_sessions"],
    )
