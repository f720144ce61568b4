"""Training-set assembly pack: oracle parity for the four driver queries
plus the operator-level invariants — chunk coverage/overlap, broadcast
decontamination vs a hand-computed overlap, mixture-sample determinism
and subset-ness, and shuffle-manifest invariance to input partitioning."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bigdatamanagement_spark.operators.traindata import (
    chunk_documents,
    contamination_overlap,
    mixture_sample,
    shuffle_manifest,
)
from bigdatamanagement_spark.queries import traindata as T
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(T.QUERIES))
def test_oracle_parity(spark, duck, sf_dir, name):
    assert_matches_oracle(T.QUERIES[name](spark, sf_dir), duck, T.ORACLE[name])


def test_chunks_cover_every_token_exactly_once_at_stride_eq_size(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b c"), (3, "")],
        "doc_id long, text string",
    )
    chunks = chunk_documents(df, "doc_id", "text", size=4, stride=4).collect()
    # doc 1: 10 tokens -> windows [0,4), [4,8), [8,10); doc 2: one window.
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert sorted(by_doc) == [1, 2, 3]  # empty text still splits to ['']
    got = [t for r in sorted(by_doc[1], key=lambda r: r.chunk_idx)
           for t in r.chunk_text.split(" ")]
    assert got == [f"t{i}" for i in range(10)]
    assert [r.n_chunk_tokens for r in sorted(by_doc[1], key=lambda r: r.chunk_idx)] == [4, 4, 2]
    assert by_doc[2][0].chunk_text == "a b c"


def test_chunks_overlap_by_size_minus_stride(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(20)))], "doc_id long, text string"
    )
    rows = sorted(
        chunk_documents(df, "doc_id", "text", size=8, stride=5).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert [r.chunk_start for r in rows] == [0, 5, 10, 15]
    a, b = rows[0].chunk_text.split(" "), rows[1].chunk_text.split(" ")
    assert a[5:] == b[:3]  # 3-token overlap


def test_contamination_overlap_matches_hand_count(spark):
    corpus = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "dogs bark loudly at night"),
         (3, "the cat sat quietly")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the cat sat on a rug")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.n_overlap_grams
        for r in contamination_overlap(corpus, bench, k=3).collect()
    }
    # bench 3-grams: {the cat sat, cat sat on, sat on a, on a rug}
    # doc 1 shares 2 ('the cat sat', 'cat sat on'); doc 3 shares 1; doc 2 none.
    assert got == {1: 2, 3: 1}


def test_mixture_sample_is_deterministic_subset(spark, sf_dir):
    docs = T._docs(spark, sf_dir)
    w = (F.substring(F.col("source"), 4, 10).cast("int") + 1) / F.lit(210.0)
    a = mixture_sample(docs, "doc_id", "source", w, 0.5)
    b = mixture_sample(docs.repartition(13), "doc_id", "source", w, 0.5)
    ids_a = {r.doc_id for r in a.select("doc_id").collect()}
    ids_b = {r.doc_id for r in b.select("doc_id").collect()}
    assert ids_a == ids_b and ids_a
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert ids_a < all_ids
    # rates are valid basis points and clipping works
    rates = {r.sample_rate_bp for r in a.select("sample_rate_bp").collect()}
    assert all(0 <= bp <= 10000 for bp in rates)


def test_shuffle_manifest_invariant_to_input_partitioning(spark, sf_dir):
    docs = T._docs(spark, sf_dir)
    m1 = {r.shard: (r.n_rows, r.order_md5)
          for r in shuffle_manifest(docs, "doc_id", 8).collect()}
    m2 = {r.shard: (r.n_rows, r.order_md5)
          for r in shuffle_manifest(docs.repartition(17), "doc_id", 8).collect()}
    assert m1 == m2
    assert sum(n for n, _ in m1.values()) == docs.count()


def test_chunking_plan_is_narrow(spark, sf_dir):
    """The chunker must not shuffle: no Exchange in the plan."""
    plan = chunk_documents(
        T._docs(spark, sf_dir), "doc_id", "text"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_sequences_conservation_and_shape(spark, sf_dir):
    """Packing conserves every token exactly once; every sequence is
    exactly seq_len tokens except the last; doc spans are contiguous."""
    from bigdatamanagement_spark.operators.traindata import pack_sequences

    docs = T._docs(spark, sf_dir)
    rows = sorted(
        pack_sequences(docs, "doc_id", "text", seq_len=T.SEQ_LEN).collect(),
        key=lambda r: r.seq_id,
    )
    total_tokens = docs.select(
        F.sum(F.size(F.split(F.lower(F.trim("text")), "\\s+")))
    ).first()[0]
    assert sum(r.n_seq_tokens for r in rows) == total_tokens
    assert [r.seq_id for r in rows] == list(range(len(rows)))
    assert all(r.n_seq_tokens == T.SEQ_LEN for r in rows[:-1])
    assert 0 < rows[-1].n_seq_tokens <= T.SEQ_LEN
    # doc ranges tile: consecutive sequences share exactly the boundary doc
    for a, b in zip(rows, rows[1:]):
        assert b.first_doc in (a.last_doc, a.last_doc + 1) or b.first_doc > a.last_doc


def test_pack_sequences_invariant_to_input_partitioning(spark, sf_dir):
    """The prefix sum must not depend on the input's physical layout."""
    from bigdatamanagement_spark.operators.traindata import pack_sequences

    docs = T._docs(spark, sf_dir)
    base = {tuple(r) for r in pack_sequences(docs, seq_len=T.SEQ_LEN).collect()}
    scrambled = docs.repartition(7, F.col("source"))
    again = {tuple(r) for r in pack_sequences(scrambled, seq_len=T.SEQ_LEN).collect()}
    assert base == again and base
