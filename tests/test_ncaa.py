"""Golden oracle tests for the NCAA pack (T16)."""

import pytest

from bigdatamanagement_spark.queries import ncaa
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(ncaa.QUERIES))
def test_ncaa_oracle(spark, duck, sf_dir, name):
    df = ncaa.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, ncaa.ORACLE[name])


def test_results_nonempty(spark, sf_dir):
    """Fixture constraints guarantee non-trivial results (FIXTURES §C3)."""
    for name in ("t16_q3_ff_red_teams", "t16_q4_stanford_home_wins",
                 "t16_q8_same_state_same_color", "t16_q10_deep_rosters"):
        assert ncaa.QUERIES[name](spark, sf_dir).count() > 0, name
