"""Crafted-case tests for operators/rank.py — the two-phase distributed
substitutes for bare Window.orderBy. Each helper is compared against the
single-partition reference computed in Python."""

import pyspark.sql.functions as F

from bigdatamanagement_spark.operators.rank import (
    global_row_number,
    global_running_max,
    global_running_sum,
    quantile_bucket,
)

_VALS = [7, 3, 3, 11, 0, 5, 9, 2, 8, 8, 1, 6]


def _df(spark):
    rows = [(i, v) for i, v in enumerate(_VALS)]
    # many partitions so the two-phase carry logic actually exercises
    return spark.createDataFrame(rows, "id long, v long").repartition(6)


def test_global_row_number_matches_sorted_order(spark):
    out, n = global_row_number(_df(spark), [F.col("v"), F.col("id")], "rk")
    assert n == len(_VALS)
    got = [(r.v, r.id) for r in out.orderBy("rk").collect()]
    assert got == sorted((v, i) for i, v in enumerate(_VALS))


def test_quantile_bucket_spans_1_to_k(spark):
    out, n = global_row_number(_df(spark), [F.col("v"), F.col("id")], "rk")
    b = out.select(quantile_bucket("rk", n, 4).alias("q"))
    got = sorted(r.q for r in b.collect())
    assert got[0] == 1 and got[-1] == 4
    # back-loaded remainder: bucket sizes differ by at most 1
    from collections import Counter

    sizes = Counter(got).values()
    assert max(sizes) - min(sizes) <= 1


def test_global_running_max_inclusive_and_exclusive(spark):
    df = _df(spark).withColumn("ord", F.col("id"))
    inc = {
        r.id: r.m
        for r in global_running_max(df, "ord", "v", "m").collect()
    }
    exc = {
        r.id: r.m
        for r in global_running_max(df, "ord", "v", "m", exclusive=True).collect()
    }
    run = None
    for i, v in enumerate(_VALS):
        assert exc[i] == run  # None for the global first row
        run = v if run is None else max(run, v)
        assert inc[i] == run


def test_global_running_sum_matches_prefix(spark):
    df = _df(spark)
    got = {
        r.id: r.s
        for r in global_running_sum(df, [F.col("id")], "v", "s").collect()
    }
    acc = 0
    for i, v in enumerate(_VALS):
        acc += v
        assert got[i] == acc


def test_rank_helpers_property(spark):
    """Hypothesis-style randomized check (bounded examples to keep the
    Spark round-trips cheap): for random multisets with duplicates, the
    distributed helpers agree with the single-partition reference."""
    import random

    rng = random.Random(20260815)
    for trial in range(3):
        vals = [rng.randint(-50, 50) for _ in range(rng.randint(1, 40))]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "id long, v long"
        ).repartition(5)

        out, n = global_row_number(df, [F.col("v"), F.col("id")], "rk")
        assert n == len(vals)
        got = [(r.v, r.id) for r in out.orderBy("rk").collect()]
        assert got == sorted((v, i) for i, v in enumerate(vals)), trial

        cum = global_running_sum(df, [F.col("id")], "v", "s")
        got_s = {r.id: r.s for r in cum.collect()}
        acc = 0
        for i, v in enumerate(vals):
            acc += v
            assert got_s[i] == acc, trial

        mx = global_running_max(df, "id", "v", "m", exclusive=True)
        got_m = {r.id: r.m for r in mx.collect()}
        run = None
        for i, v in enumerate(vals):
            assert got_m[i] == run, trial
            run = v if run is None else max(run, v)


def test_global_rank_and_running_sum_fuses_exactly(spark):
    """The fused helper must equal global_row_number + global_running_sum
    chained (one staging pass instead of two)."""
    import pyspark.sql.functions as F

    from bigdatamanagement_spark.operators.rank import (
        global_rank_and_running_sum,
        global_row_number,
        global_running_sum,
    )

    df = spark.range(0, 5000).select(
        F.col("id"),
        (F.xxhash64("id") % 100).alias("k"),
        (F.col("id") % 3).alias("y"),
    )
    fused = {
        (r["id"], r["rk"], r["cum"])
        for r in global_rank_and_running_sum(
            df, [F.asc("k"), F.asc("id")], "y", "rk", "cum"
        ).collect()
    }
    ranked, _ = global_row_number(df, [F.asc("k"), F.asc("id")], "rk")
    chained = {
        (r["id"], r["rk"], r["cum"])
        for r in global_running_sum(
            ranked, [F.asc("rk")], "y", "cum"
        ).collect()
    }
    assert fused == chained
