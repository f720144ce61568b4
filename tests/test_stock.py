"""Golden oracle + reference-derived value tests for the stock pack."""

import pytest

from bigdatamanagement_spark.queries import stock
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(stock.QUERIES))
def test_stock_oracle(spark, duck, sf_dir, name):
    df = stock.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, stock.ORACLE[name])


def test_post_delete_rowcount(spark):
    """FIXTURES §E: DELETE leaves 14 stockprice rows."""
    assert stock.tables(spark)["stockprice"].count() == 14


def test_q1_golden(spark, sf_dir):
    rows = stock.big_or_small_companies(spark, sf_dir).collect()
    assert [r.name for r in rows] == ["Apple", "GameStop", "Microsoft", "StartUp"]


def test_q2_golden(spark, sf_dir):
    rows = {r.name: r for r in stock.weekly_stats(spark, sf_dir).collect()}
    assert set(rows) == {"Apple", "Microsoft"}  # GameStop deleted
    assert rows["Apple"].lowest_price == 163.56
    assert rows["Apple"].highest_price == 171.05
    assert rows["Apple"].avg_volume == 61411420.0
    assert rows["Microsoft"].lowest_price == 267.98
    assert abs(rows["Microsoft"].avg_close_price - 275.384) < 1e-9


def test_q3_golden(spark, sf_dir):
    rows = stock.resilient_companies(spark, sf_dir).collect()
    assert sorted(r.name for r in rows) == ["Handy Repair", "StartUp"]
    assert all(r.closing_price_aug30 is None for r in rows)


def test_max_drawdown_is_nonnegative_and_bounded_by_peak(spark, sf_dir):
    from bigdatamanagement_spark.queries.stock import max_drawdown

    rows = max_drawdown(spark, sf_dir).collect()
    assert rows  # survivors exist after the S-08 delete
    for r in rows:
        assert 0 <= r["max_drawdown_cents"] <= r["peak_cents"]
        assert r["company_id"] != 2  # deleted company never reappears


def test_weekly_ohlc_bars_are_consistent(spark, sf_dir):
    from bigdatamanagement_spark.queries.stock import weekly_ohlc

    rows = weekly_ohlc(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["w_low"] <= r["w_high"]
        assert r["w_low"] <= r["w_open"] <= r["w_high"]
        assert r["w_low"] <= r["w_close"] <= r["w_high"]
        assert 1 <= r["n_days"] <= 7
