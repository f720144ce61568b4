"""Property tests for the winnowing scheme: a pure-Python reference
implementation (same md5-slice hash as the engine), the MOSS guarantee
over random inputs with a planted shared run, and a seeded
Spark-vs-reference equivalence sweep — so the operator is pinned by
THREE independent implementations (Spark, DuckDB oracle, this one)."""

from __future__ import annotations

import hashlib
import random

from hypothesis import given, settings
from hypothesis import strategies as st

from bigdatamanagement_spark.operators.winnow import K_WORDS, W_WINDOW

VOCAB = ["w%02d" % i for i in range(40)]


def _hash(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)


def winnow_ref(toks: list[str], k: int = K_WORDS, w: int = W_WINDOW) -> set[int]:
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [_hash(g) for g in grams]
    return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}


@settings(max_examples=200, deadline=None)
@given(
    pre_a=st.lists(st.sampled_from(VOCAB), max_size=10),
    post_a=st.lists(st.sampled_from(VOCAB), max_size=10),
    pre_b=st.lists(st.sampled_from(VOCAB), max_size=10),
    post_b=st.lists(st.sampled_from(VOCAB), max_size=10),
    run=st.lists(
        st.sampled_from(VOCAB),
        min_size=K_WORDS + W_WINDOW - 1,
        max_size=K_WORDS + W_WINDOW + 4,
    ),
)
def test_winnowing_guarantee_property(pre_a, post_a, pre_b, post_b, run):
    """Schleimer et al. Thm: two documents sharing any run of at least
    k + w - 1 tokens share at least one selected fingerprint, for ANY
    surrounding context."""
    a = winnow_ref(pre_a + run + post_a)
    b = winnow_ref(pre_b + run + post_b)
    assert a & b


@settings(max_examples=200, deadline=None)
@given(toks=st.lists(st.sampled_from(VOCAB), min_size=0, max_size=60))
def test_winnowing_density_bounds(toks):
    """Selected set is nonempty iff a full window exists, and never
    exceeds the window count (each window selects one value)."""
    n_grams = max(len(toks) - K_WORDS + 1, 0)
    n_windows = max(n_grams - W_WINDOW + 1, 0)
    fps = winnow_ref(toks)
    if n_windows == 0:
        assert fps == set()
    else:
        assert 0 < len(fps) <= n_windows


def test_spark_matches_reference(spark):
    """Seeded corpus: the Spark operator's fingerprint sets equal the
    pure-Python reference exactly, doc by doc."""
    from bigdatamanagement_spark.operators.winnow import winnow_fingerprints

    rng = random.Random(7)
    rows = []
    for doc_id in range(30):
        n = rng.randint(0, 40)
        rows.append((doc_id, " ".join(rng.choice(VOCAB) for _ in range(n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, set[int]] = {}
    for r in winnow_fingerprints(df, "doc_id", "text").collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    for doc_id, text in rows:
        want = winnow_ref(text.split()) if text else set()
        assert got.get(doc_id, set()) == want, doc_id
