"""Oracle + structural tests for the sampled-twin pack (queries/sampled.py).

The twins exist so the sf0.1 validation sweep never has to skip the
quadratic-oracle dedup family: same operator code paths, deterministic
block-sampled input, brute-force oracles shadow-scoped to the sample.
"""

import pytest

from bigdatamanagement_spark.queries import sampled
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(sampled.QUERIES))
def test_sampled_oracle(spark, duck, sf_dir, name):
    df = sampled.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, sampled.ORACLE[name])


def test_every_twin_has_an_oracle():
    """The whole point of this pack: no rows-only entries."""
    assert set(sampled.QUERIES) == set(sampled.ORACLE)


def test_sample_preserves_batch_class(spark, sf_dir):
    """The block sample must keep the mod-BATCH_MOD snapshot class the
    incremental/streaming twins split on — a plain mod sample would
    silently empty one side and turn both twins vacuous."""
    from bigdatamanagement_spark.queries.extensions import BATCH_MOD
    from bigdatamanagement_spark.queries.pipeline import _docs

    d = _docs(spark, sf_dir, sampled=True)
    classes = {
        r[0]
        for r in d.selectExpr(f"doc_id % {BATCH_MOD}").distinct().collect()
    }
    assert classes == set(range(BATCH_MOD))


def test_shadow_handles_with_and_recursive():
    got = sampled._shadow("WITH a AS (SELECT 1) SELECT * FROM a", {"t": "x = 1"})
    assert got.startswith("WITH t AS (SELECT * FROM main.t WHERE x = 1), a AS")
    got = sampled._shadow(
        "WITH RECURSIVE r(n) AS (SELECT 1) SELECT * FROM r", {"t": "x = 1"}
    )
    assert got.startswith(
        "WITH RECURSIVE t AS (SELECT * FROM main.t WHERE x = 1), r(n) AS"
    )
    got = sampled._shadow("SELECT * FROM t", {"t": "x = 1"})
    assert got.startswith("WITH t AS (SELECT * FROM main.t WHERE x = 1) SELECT")
