"""Golden oracle + property tests for the weather pack (T14)."""

import pytest

from bigdatamanagement_spark.operators.downsample import hourly_downsample
from bigdatamanagement_spark.queries import weather
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(weather.QUERIES))
def test_weather_oracle(spark, duck, sf_dir, name):
    df = weather.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, weather.ORACLE[name])


def test_hourly_has_one_row_per_station_date_hour(spark):
    h = weather.hourly(spark)
    assert (
        h.groupBy("station", "date", "hour").count().filter("count > 1").count() == 0
    )


def test_hourly_downsample_idempotent(spark):
    """Property (SURVEY §5.2.4): downsampling an already-hourly frame is a no-op."""
    h = weather.hourly(spark)
    again = hourly_downsample(h.drop("hour"))
    assert again.count() == h.count()


def test_day_slice_is_24_rows(spark, sf_dir):
    assert weather.day_slice_sea(spark, sf_dir).count() == 24
