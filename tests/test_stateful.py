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
