"""T76 ExactSubstr dedup: oracle goldens plus the construction's own
invariants — the k-gram seed/interval-union identity, coverage bounds,
and a hand-checked micro fixture where the exact duplicated-token set
is countable by eye."""

from __future__ import annotations

import pyspark.sql.functions as F

from bigdatamanagement_spark.operators.substr import (
    K_SUB,
    duplicated_seed_positions,
    duplicated_token_coverage,
    grams_with_text,
)
from bigdatamanagement_spark.queries import analytics58
from tests.conftest import assert_matches_oracle


def test_t76_queries_match_oracle(spark, sf_dir, duck):
    for name, fn in analytics58.QUERIES.items():
        assert_matches_oracle(fn(spark, sf_dir), duck, analytics58.ORACLE[name])


def test_coverage_bounds(spark, sf_dir):
    """0 <= dup_tokens <= n_tokens per source, and the corpus plants
    ~4.5% near-dups so the aggregate dup fraction must be clearly
    positive (shared prefixes are verbatim >=8-token spans)."""
    rows = analytics58.substr_dup_stats(spark, sf_dir).collect()
    assert rows
    tot_tok = sum(r.n_tokens for r in rows)
    tot_dup = sum(r.dup_tokens for r in rows)
    for r in rows:
        assert 0 <= r.dup_tokens <= r.n_tokens, r
    assert 0.01 < tot_dup / tot_tok < 0.5, (tot_dup, tot_tok)


def test_micro_fixture_exact_coverage(spark):
    """Two docs sharing one verbatim 10-token run, all other tokens
    unique: the duplicated-token coverage must be EXACTLY 10 in each
    doc (3 seed 8-grams whose [pos, pos+8) union spans 10 tokens), and
    0 for an unrelated doc."""
    shared = " ".join(f"s{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (0, "a0 a1 a2 " + shared + " a3 a4"),
            (1, "b0 " + shared + " b1 b2 b3 b4 b5"),
            (2, " ".join(f"c{i}" for i in range(20))),
        ],
        "doc_id long, text string",
    )
    g = grams_with_text(docs, "doc_id", "text", K_SUB)
    cov = {
        r.doc_id: r.dup_tokens
        for r in duplicated_token_coverage(
            duplicated_seed_positions(g), K_SUB
        ).collect()
    }
    assert cov.get(0) == 10 and cov.get(1) == 10, cov
    assert 2 not in cov, cov


def test_seed_identity_matches_bruteforce(spark, sf_dir):
    """The interval-union coverage equals the brute-force count of
    distinct token positions lying under any duplicated seed span —
    the construction's defining identity, checked on the real corpus."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    )
    g = grams_with_text(docs, "doc_id", "text", K_SUB)
    seeds = duplicated_seed_positions(g)
    want = (
        seeds.select(
            "doc_id",
            F.explode(
                F.expr(f"sequence(pos, pos + {K_SUB - 1})")
            ).alias("tokpos"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("dup_tokens"))
    )
    got = duplicated_token_coverage(seeds, K_SUB)
    a = {r.doc_id: r.dup_tokens for r in got.collect()}
    b = {r.doc_id: r.dup_tokens for r in want.collect()}
    assert a == b


def test_span_histogram_consistency(spark, sf_dir):
    """sum(total_tokens) over the span histogram == sum(dup_tokens) of
    the per-source stats (the runs partition the covered set), and the
    minimum span length is >= K_SUB."""
    hist = analytics58.substr_span_histogram(spark, sf_dir).collect()
    stats = analytics58.substr_dup_stats(spark, sf_dir).collect()
    assert hist
    assert min(r.span_tokens for r in hist) >= K_SUB
    assert sum(r.total_tokens for r in hist) == sum(
        r.dup_tokens for r in stats
    )


def test_micro_fixture_run_spans(spark):
    """The 10-token shared run must appear as exactly ONE maximal span
    of length 10 in each of the two docs."""
    from bigdatamanagement_spark.operators.substr import (
        duplicated_run_spans,
    )

    shared = " ".join(f"s{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (0, "a0 a1 a2 " + shared + " a3 a4"),
            (1, "b0 " + shared + " b1 b2 b3 b4 b5"),
        ],
        "doc_id long, text string",
    )
    g = grams_with_text(docs, "doc_id", "text", K_SUB)
    spans = duplicated_run_spans(
        duplicated_seed_positions(g), K_SUB
    ).collect()
    assert sorted((r.doc_id, r.span_tokens) for r in spans) == [
        (0, 10),
        (1, 10),
    ]
