"""Golden oracle tests for the relational pack (T01-T03)."""

import pytest

from bigdatamanagement_spark.queries import tpch
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(tpch.QUERIES))
def test_tpch_oracle(spark, duck, sf_dir, name):
    df = tpch.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, tpch.ORACLE[name])


def test_t01_limit(spark, sf_dir):
    assert tpch.QUERIES["t01_top10_recent_orders_america"](spark, sf_dir).count() == 10


def test_global_row_number_is_partitioning_invariant(spark):
    """global_row_number must equal a driver-side sort rank regardless of
    how the input arrives (1 partition vs many, shuffled order)."""
    import random

    import pyspark.sql.functions as F

    from bigdatamanagement_spark.operators.rank import global_row_number

    rows = [(i, random.Random(7 + i).randint(0, 50)) for i in range(500)]
    expect = {
        k: r + 1
        for r, (k, _) in enumerate(sorted(rows, key=lambda t: (-t[1], t[0])))
    }
    for nparts in (1, 7):
        df = spark.createDataFrame(rows, "id long, v long").repartition(nparts)
        out, n = global_row_number(df, [F.desc("v"), F.asc("id")], "rk")
        assert n == 500
        got = {r.id: r.rk for r in out.collect()}
        assert got == expect


def test_rfm_scores_are_quartiles(spark, sf_dir):
    """Each RFM score dimension splits customers into 4 buckets whose
    sizes differ by at most 1, and the best spender gets m_score 1."""
    from bigdatamanagement_spark.queries.tpch import customer_rfm_segments

    rows = customer_rfm_segments(spark, sf_dir).collect()
    for col in ("r_score", "f_score", "m_score"):
        sizes = {}
        for r in rows:
            sizes[r[col]] = sizes.get(r[col], 0) + 1
        assert set(sizes) == {1, 2, 3, 4}
        assert max(sizes.values()) - min(sizes.values()) <= 1
