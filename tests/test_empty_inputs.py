"""Empty-input robustness: on a 1000-executor cluster, empty partitions
and empty inputs (a filter that matches nothing, a cold-start table)
are guaranteed. Every reusable operator must return an EMPTY result
with the right schema — not throw — especially the two-phase global
operators whose driver-side offset step could trip on zero
partitions/rows."""

from __future__ import annotations

import pyspark.sql.functions as F


def _empty_events(spark):
    return spark.createDataFrame(
        [], schema="user_id bigint, event_id bigint, ts timestamp_ntz, v bigint"
    )


def test_global_row_number_on_empty(spark):
    from bigdatamanagement_spark.operators.rank import global_row_number

    out, n = global_row_number(_empty_events(spark), [F.col("v")], "rn")
    assert n == 0
    assert out.count() == 0
    assert "rn" in out.columns


def test_global_running_sum_on_empty(spark):
    from bigdatamanagement_spark.operators.rank import global_running_sum

    out = global_running_sum(_empty_events(spark), [F.col("v")], "v", "cum")
    assert out.count() == 0
    assert "cum" in out.columns


def test_global_running_max_on_empty(spark):
    from bigdatamanagement_spark.operators.rank import global_running_max

    out = global_running_max(_empty_events(spark), "v", "v")
    assert out.count() == 0


def test_sessionize_and_bounds_on_empty(spark):
    from bigdatamanagement_spark.operators.sessionize import (
        session_bounds,
        sessionize,
    )

    e = _empty_events(spark)
    assert sessionize(e, "user_id", "ts", 1800).count() == 0
    assert session_bounds(e, "user_id", "ts", 1800).count() == 0


def test_nest_with_childless_parent_and_empty_child(spark):
    from bigdatamanagement_spark.operators.nest import nest, unnest

    parent = spark.createDataFrame([(1, "a")], schema="pk bigint, name string")
    child = spark.createDataFrame([], schema="ck bigint, x bigint")
    out = nest(parent, child, "pk", "ck", "kids")
    rows = out.collect()
    assert rows[0]["kids"] == []  # empty array, never NULL
    assert unnest(out, "kids").count() == 0  # $unwind drops empties


def test_asof_join_with_empty_right(spark):
    from bigdatamanagement_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], schema="k bigint, lts string"
    ).select("k", F.to_timestamp("lts").alias("lts"))
    right = spark.createDataFrame(
        [], schema="k bigint, rts timestamp, payload bigint"
    )
    out = asof_join(left, right, "k", "lts", "rts").collect()
    assert len(out) == 1
    assert out[0]["payload"] is None  # left-join semantics survive emptiness


def test_merge_upsert_with_empty_changes(spark):
    from bigdatamanagement_spark.operators.merge import merge_upsert

    base = spark.createDataFrame([(1, 10), (2, 20)], schema="k bigint, v bigint")
    changes = spark.createDataFrame([], schema="k bigint, v bigint")
    out = merge_upsert(base, changes, ["k"])
    assert sorted((r["k"], r["v"]) for r in out.collect()) == [(1, 10), (2, 20)]


def test_kmeans_shape_survives_tiny_input(spark):
    """Fewer vectors than K: clusters collapse but nothing throws and
    every vector stays assigned."""
    import bigdatamanagement_spark.queries.analytics3 as a3

    tiny = spark.createDataFrame(
        [(1, [1.0] * 64), (2, [-1.0] * 64)],
        schema="vec_id bigint, embedding array<float>",
    )
    orig = a3.load_testdata
    try:
        a3.load_testdata = lambda s, d, tables=None, register=None: {
            "embeddings": tiny
        }
        rows = a3.kmeans_clusters(spark, "ignored").collect()
    finally:
        a3.load_testdata = orig
    assert sum(r["n_vecs"] for r in rows) == 2
