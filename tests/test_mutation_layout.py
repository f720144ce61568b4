"""Tests: sessionization + SCD2 + merge oracles, merge operator unit
semantics, and Z-order layout file-statistics tightness."""

import glob
import os

import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

from bigdatamanagement_spark.operators.merge import (
    apply_deletes,
    merge_upsert,
    scd2_from_events,
)
from bigdatamanagement_spark.operators.sessionize import sessionize
from bigdatamanagement_spark.queries import events as EV
from bigdatamanagement_spark.queries import mutation as M
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(M.ORACLE))
def test_mutation_oracle(spark, duck, sf_dir, name):
    assert_matches_oracle(M.QUERIES[name](spark, sf_dir), duck, M.ORACLE[name])


@pytest.mark.parametrize("name", ["t17_session_stats", "t17_scd2_purchase_history"])
def test_events_new_oracles(spark, duck, sf_dir, name):
    assert_matches_oracle(EV.QUERIES[name](spark, sf_dir), duck, EV.ORACLE[name])


def test_merge_upsert_semantics(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k: long, s: string, v: double"
    )
    ups = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k: long, s: string, v: double"
    )
    got = {r.k: (r.s, r.v) for r in merge_upsert(base, ups, ["k"]).collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_apply_deletes_semantics(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k: long, s: string")
    dels = spark.createDataFrame([(2,), (9,)], "k: long")
    assert {r.k for r in apply_deletes(base, dels, ["k"]).collect()} == {1, 3}


def test_sessionize_gap_boundaries(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 100),
        (1, t0 + dt.timedelta(minutes=10), 101),  # same session (gap 10m)
        (1, t0 + dt.timedelta(minutes=50), 102),  # new session (gap 40m > 30m)
        (1, t0 + dt.timedelta(minutes=80), 103),  # exactly 30m gap -> NOT new
        (2, t0, 200),
    ]
    df = spark.createDataFrame(rows, "user_id: long, ts: timestamp, event_id: long")
    got = {
        r.event_id: r.session_seq
        for r in sessionize(df, "user_id", "ts", 1800, "event_id").collect()
    }
    assert got == {100: 1, 101: 1, 102: 2, 103: 2, 200: 1}


def test_scd2_intervals_partition_time(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, 1, 5.0), (1, t0 + dt.timedelta(days=1), 2, 7.0), (2, t0, 3, 9.0)]
    df = spark.createDataFrame(rows, "k: long, ts: timestamp, eid: long, v: double")
    hist = scd2_from_events(df, "k", "ts", ["v"], "eid").collect()
    by_key = {}
    for r in hist:
        by_key.setdefault(r.k, []).append(r)
    k1 = sorted(by_key[1], key=lambda r: r.valid_from)
    assert k1[0].valid_to == k1[1].valid_from and not k1[0].is_current
    assert k1[1].valid_to is None and k1[1].is_current
    assert by_key[2][0].is_current


def test_zorder_files_are_narrow_in_both_dims(spark, sf_dir, tmp_path):
    """Z-order clustering must leave every file narrow in BOTH clustered
    dimensions, where a linear sort is narrow in one and full-width in
    the other — the property parquet min/max skipping depends on."""
    from bigdatamanagement_spark.sources.layout import write_zordered

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("tsu"), "event_id"
    )
    lo_u, hi_u, lo_t, hi_t = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("tsu"), F.max("tsu")
    ).collect()[0]

    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "linear")
    n_files = 16
    write_zordered(
        ev, zpath,
        [(F.col("user_id"), lo_u, hi_u), (F.col("tsu"), lo_t, hi_t)],
        n_files=n_files, bits=12,
    )
    ev.repartitionByRange(n_files, "tsu").sortWithinPartitions("tsu").write.mode(
        "overwrite"
    ).parquet(lpath)

    def avg_span(path, col, lo, hi):
        spans = []
        for f in glob.glob(os.path.join(path, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = next(
                j for j in range(md.row_group(0).num_columns)
                if md.row_group(0).column(j).path_in_schema == col
            )
            mn = min(md.row_group(i).column(idx).statistics.min
                     for i in range(md.num_row_groups))
            mx = max(md.row_group(i).column(idx).statistics.max
                     for i in range(md.num_row_groups))
            spans.append((mx - mn) / max(hi - lo, 1))
        return sum(spans) / len(spans)

    # identity round-trip first
    assert spark.read.parquet(zpath).count() == ev.count()

    z_user, z_ts = avg_span(zpath, "user_id", lo_u, hi_u), avg_span(zpath, "tsu", lo_t, hi_t)
    l_user = avg_span(lpath, "user_id", lo_u, hi_u)
    # linear-by-ts layout is useless for user_id pruning...
    assert l_user > 0.9
    # ...while the Z-order layout is narrow in both dimensions.
    assert z_user < 0.6 and z_ts < 0.6, (z_user, z_ts)


def test_hive_partitioned_write_prunes_directories(spark, sf_dir, tmp_path):
    """A predicate on the partition column must appear as a
    PartitionFilters entry (planning-time directory pruning) and the
    pruned scan must read fewer files than the full table."""
    from bigdatamanagement_spark.sources.layout import write_hive_partitioned

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = str(tmp_path / "events_by_type")
    write_hive_partitioned(ev, out, ["event_type"])

    pruned = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan, plan
    assert "(event_type" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0], plan

    # value parity with the unpartitioned filter
    want = ev.filter(F.col("event_type") == "purchase").count()
    assert pruned.count() == want


def test_snapshot_diff_classification(spark):
    """All four change classes on a hand-built pair of snapshots,
    including NULL-vs-empty payloads (sentinel hashing)."""
    from bigdatamanagement_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None), (5, "")],
        "k long, v string",
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, ""), (5, ""), (6, "new")],
        "k long, v string",
    )
    got = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert got == {
        1: "unchanged",
        2: "modified",
        3: "removed",
        4: "modified",  # NULL -> '' is a content change, not equality
        5: "unchanged",
        6: "added",
    }


def test_cdc_apply_covers_every_user(spark, sf_dir):
    """n_live + n_tombstoned = distinct users in the changelog (every
    key resolves to exactly one final state or tombstone)."""
    from bigdatamanagement_spark.queries.mutation import cdc_apply_changelog
    from bigdatamanagement_spark.catalog import load_testdata

    row = cdc_apply_changelog(spark, sf_dir).first()
    ev = load_testdata(spark, sf_dir, tables=("events",), register=False)["events"]
    n_users = ev.select("user_id").distinct().count()
    assert row["n_live"] + row["n_tombstoned"] == n_users
    assert row["n_tombstoned"] > 0  # 'error' finality occurs at test SFs


def test_dynamic_partition_pruning_fires(spark, sf_dir, tmp_path):
    """A month-partitioned fact joined to a filtered dim on the
    partition column must plan a DPP subquery filter (the runtime
    partition pruning that makes dim-filtered fact scans cheap at
    100 TB) AND prune correctly — the result equals the statically
    filtered computation."""
    from bigdatamanagement_spark.catalog import load_testdata
    from bigdatamanagement_spark.plans import executed_plan

    t = load_testdata(
        spark, sf_dir, tables=("lineitem", "orders"), register=False
    )
    path = str(tmp_path / "li_by_month")
    li = t["lineitem"].withColumn(
        "ship_month", F.date_format("l_shipdate", "yyyy-MM")
    )
    li.write.partitionBy("ship_month").mode("overwrite").parquet(path)
    fact = spark.read.parquet(path)
    dim = (
        t["orders"]
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.date_format("o_orderdate", "yyyy-MM").alias("m"))
        .distinct()
    )
    joined = fact.join(dim, fact.ship_month == dim.m).agg(
        F.sum("l_quantity").alias("q"), F.count(F.lit(1)).alias("n")
    )
    plan = executed_plan(joined)
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    got = joined.first()
    months = {r["m"] for r in dim.collect()}
    want = (
        li.filter(F.col("ship_month").isin(*months))
        .agg(F.sum("l_quantity").alias("q"), F.count(F.lit(1)).alias("n"))
        .first()
    )
    assert got["q"] == want["q"] and got["n"] == want["n"]
