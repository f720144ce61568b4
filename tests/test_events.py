"""Golden oracle tests for the events time-series pack (T17)."""

import pytest

from bigdatamanagement_spark.queries import events
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(events.QUERIES))
def test_events_oracle(spark, duck, sf_dir, name):
    df = events.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, events.ORACLE[name])
