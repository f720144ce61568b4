"""Logic-level property tests (pure Python, no Spark session): the
cross-engine idioms the oracle contract leans on, checked against
straightforward reference implementations over random inputs."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from bigdatamanagement_spark.operators.bpe import RS, US


def _wrap(symbols: list[str]) -> str:
    return "".join(RS + s + US for s in symbols)


def _merge_via_replace(s: str, a: str, b: str) -> str:
    """The engine's merge primitive: plain string replace."""
    return s.replace(RS + a + US + RS + b + US, RS + a + b + US)


def _merge_reference(symbols: list[str], a: str, b: str) -> list[str]:
    """Reference BPE greedy left-to-right non-overlapping merge."""
    out, i = [], 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


@settings(max_examples=300, deadline=None)
@given(
    syms=st.lists(st.sampled_from(["a", "b", "c", "ab", "bc"]), max_size=12),
    pair=st.tuples(
        st.sampled_from(["a", "b", "c", "ab", "bc"]),
        st.sampled_from(["a", "b", "c", "ab", "bc"]),
    ),
)
def test_marker_replace_equals_reference_bpe_merge(syms, pair):
    """String replace over per-symbol markers IS greedy BPE merge, for
    any symbol sequence and any pair — including multi-char symbols and
    back-to-back merge sites."""
    a, b = pair
    got = _merge_via_replace(_wrap(syms), a, b)
    want = _wrap(_merge_reference(syms, a, b))
    assert got == want, (syms, pair, got, want)


@settings(max_examples=300, deadline=None)
@given(sx=st.integers(-(10**15), 10**15), n=st.integers(1, 10**6))
def test_portable_floor_division_case(sx, n):
    """The CASE WHEN sx >= 0 THEN sx div n ELSE -((-sx + n - 1) div n)
    idiom (truncating div on non-negatives) equals Python floor
    division for every sign."""

    def trunc_div(a: int, b: int) -> int:
        return a // b  # operands kept non-negative below

    got = trunc_div(sx, n) if sx >= 0 else -trunc_div(-sx + n - 1, n)
    assert got == sx // n, (sx, n)


@settings(max_examples=200, deadline=None)
@given(
    weights=st.lists(st.integers(1, 50), min_size=1, max_size=30),
    values=st.lists(st.integers(-1000, 1000), min_size=30, max_size=30),
)
def test_weighted_median_crossing_rule(weights, values):
    """min{v : 2·cumweight(≤v) ≥ total} is order-independent and sits
    at the weighted center (reference: scan the sorted multiset)."""
    pairs = sorted(zip(values[: len(weights)], weights))
    total = sum(w for _, w in pairs)
    cum = 0
    want = None
    for v, w in pairs:
        cum += w
        if 2 * cum >= total:
            want = v
            break
    # engine rule: filter rows where 2*cum >= total, take min value
    cum2, selected = 0, []
    for v, w in pairs:
        cum2 += w
        if 2 * cum2 >= total:
            selected.append(v)
    assert min(selected) == want
    le = sum(w for v, w in pairs if v <= want)
    lt = sum(w for v, w in pairs if v < want)
    assert 2 * le >= total and 2 * lt < total


@given(
    st.integers(min_value=1, max_value=10**12),
)
@settings(max_examples=200, deadline=None)
def test_micro_nat_ln_floor_is_engine_stable(n):
    """The floored-micro-nat convention floor(1e6·ln(n)) that the
    entropy/KL/PSI/Zipf oracles rely on: the double ln(n) would only
    flip the floor if it sat within one ulp of an exact micro-nat
    boundary. Verify python/numpy agree (two independent libm paths),
    and that the value is comfortably far from the boundary for
    sampled integers — the margin that makes the convention safe."""
    import math

    import numpy as np

    pv = math.floor(math.log(n) * 1_000_000.0)
    nv = int(np.floor(np.log(np.float64(n)) * np.float64(1_000_000.0)))
    assert pv == nv
    frac = (math.log(n) * 1_000_000.0) % 1.0
    # ulp of x*1e6 near ln(1e12)*1e6 ≈ 2.7e7 is ~4e-9: a fractional
    # part within 1e-6 of 0/1 would be the only risk zone
    if n > 1:
        assert 1e-9 < frac < 1 - 1e-9 or frac == 0.0


@settings(max_examples=200, deadline=None)
@given(
    zs=st.lists(
        st.floats(0.0, 6.0, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=40,
    )
)
def test_bh_threshold_ladder_equals_pvalue_stepup(zs):
    """The analytics36 rule (rank |z| desc, largest k with
    |z|_(k) >= Phi^-1(1 - a*k/(2m)), reject rank <= k) is exactly the
    Benjamini-Hochberg step-up on two-sided normal p-values."""
    from statistics import NormalDist

    nd = NormalDist()
    alpha, m = 0.05, len(zs)
    ordered = sorted(zs, reverse=True)
    thresholds = [nd.inv_cdf(1 - alpha * i / (2 * m)) for i in range(1, m + 1)]
    k_ladder = max(
        (i + 1 for i, (z, t) in enumerate(zip(ordered, thresholds)) if z >= t),
        default=0,
    )
    # classic BH: sort p ascending, k = max{i : p_(i) <= a*i/m}
    ps = sorted(2 * (1 - nd.cdf(z)) for z in zs)
    k_bh = max(
        (i + 1 for i, p in enumerate(ps) if p <= alpha * (i + 1) / m),
        default=0,
    )
    assert k_ladder == k_bh, (ordered, ps)


@settings(max_examples=200, deadline=None)
@given(
    sizes=st.lists(st.integers(1, 500), min_size=1, max_size=16),
    gaps=st.lists(st.integers(1, 20), min_size=1, max_size=16),
)
def test_croston_dyadic_fold_equals_sequential_ses(sizes, gaps):
    """z_num/p_num (the analytics28 dyadic convolutions with the
    2^(n-1) denominators cancelled) equals the ratio of two sequential
    alpha=1/2 SES recursions run over the same series."""
    n = min(len(sizes), len(gaps))
    sizes, gaps = sizes[:n], gaps[:n]

    def ses_half(xs):
        level = float(xs[0])
        for x in xs[1:]:
            level = (x + level) / 2.0
        return level

    def conv(xs):
        return xs[0] + sum(x << (i - 1) for i, x in enumerate(xs) if i >= 1)

    z_num = conv(sizes)
    p_num = conv(gaps)
    got = z_num / p_num
    want = ses_half(sizes) / ses_half(gaps)
    assert abs(got - want) < 1e-9 * max(1.0, want), (sizes, gaps)


@settings(max_examples=300, deadline=None)
@given(
    tri=st.tuples(
        st.integers(-5, 5), st.integers(-5, 5), st.integers(-5, 5)
    )
)
def test_ordinal_pattern_bits_injective_on_strict_orders(tri):
    """The analytics33 3-bit ordinal encoding distinguishes every
    strict ordering of (a, b, c): same pattern id implies the same
    ordinal ranking (earlier-wins ties, <= convention)."""
    a, b, c = tri

    def pid(a, b, c):
        return (
            (0 if a <= b else 1)
            + (0 if a <= c else 1) * 2
            + (0 if b <= c else 1) * 4
        )

    # injectivity over strict orders: enumerate all 6 permutations of
    # three DISTINCT values and assert distinct pattern ids
    import itertools

    vals = (1, 2, 3)
    ids = {pid(*p) for p in itertools.permutations(vals)}
    assert len(ids) == 6
    # and the id is a pure function of the ordinal relations
    assert 0 <= pid(a, b, c) <= 7
