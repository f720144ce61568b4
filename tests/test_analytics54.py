"""T72 JL random projection: oracle goldens plus the statistical pins
JL actually promises — per-vector norm ratios concentrate near 1
(mean within a band), pair-distortion mass sits near ratio 1, and the
derived sign matrix is the same object on both engines and roughly
balanced."""

from __future__ import annotations

import pyspark.sql.functions as F

from bigdatamanagement_spark.queries import analytics54
from tests.conftest import assert_matches_oracle


def test_t72_queries_match_oracle(spark, sf_dir, duck):
    for name, fn in analytics54.QUERIES.items():
        assert_matches_oracle(fn(spark, sf_dir), duck, analytics54.ORACLE[name])


def test_jl_norm_concentration_band(spark, sf_dir):
    rows = analytics54.jl_norm_concentration(spark, sf_dir).collect()
    n = sum(r.n_vecs for r in rows)
    mean = sum(r.mean_ratio_ppm * r.n_vecs for r in rows) / n
    # E[ratio] = 1; m = 16 gives sd ~ sqrt(2/m) ~ 0.35 per vector, so
    # the corpus-level mean sits well within +/-15%
    assert 850_000 <= mean <= 1_150_000, mean


def test_jl_distortion_mass_near_one(spark, sf_dir):
    rows = analytics54.jl_pair_distortion(spark, sf_dir).collect()
    total = sum(r.n_pairs for r in rows)
    near = sum(r.n_pairs for r in rows if 3 <= r.bucket <= 20)
    # m = 16 is a coarse sketch (sd ~ 0.35), so the band is wide:
    # >= 85% of pairs within ratio [0.3, 2.1) — extreme distortion
    # stays exponentially rare even at this m
    assert near / total >= 0.85, (near, total)
    # and the mode sits near ratio 1
    mode = max(rows, key=lambda r: r.n_pairs).bucket
    assert 5 <= mode <= 15, mode


def test_sign_matrix_balanced_and_deterministic(spark):
    rows = analytics54._signs(spark).collect()
    assert len(rows) == analytics54.M_PROJ * analytics54.EMB_DIM
    assert {r.s for r in rows} == {-1, 1}
    balance = sum(r.s for r in rows)
    assert abs(balance) < 200  # roughly balanced Rademacher matrix
    # per-row balance: no projection row is degenerate (all same sign)
    per_r: dict[int, int] = {}
    for r in rows:
        per_r[r.r] = per_r.get(r.r, 0) + r.s
    assert all(abs(v) < analytics54.EMB_DIM for v in per_r.values())
