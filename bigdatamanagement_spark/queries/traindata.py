"""Training-set assembly pack: driver queries over ``operators/traindata``
(SURVEY §7 step 8 — the corpus→training-set stages downstream of
curation): fixed-window chunking, benchmark decontamination, source-
mixture sampling, and the deterministic global-shuffle manifest.

Every query is DuckDB-oracle checked. Determinism notes:
- chunk windows are pure array slices of the whitespace tokenization both
  engines share (`regexp_split_to_array` ≡ `F.split`), hashed with md5 so
  the compared values are engine-neutral strings;
- sampling/sharding decisions are Knuth-hash BIGINT arithmetic with
  integer basis-point thresholds (never `rand()`/native `hash()`);
- the mixture weight is derived from the source NAME (`(idx+1)/210`)
  with the same double op order in both engines, so the floored
  basis-point rates agree bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.operators.traindata import (
    KNUTH,
    PRIME2,
    chunk_documents,
    contamination_overlap,
    mixture_sample,
    pack_sequences,
    shuffle_manifest,
)

CHUNK_SIZE = 16
CHUNK_STRIDE = 12
BENCH_MOD = 41  # doc_id % 41 == 0 plays the held-out eval benchmark
N_SHARDS = 8
SEQ_LEN = 128


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("documents",), register=False)[
        "documents"
    ]


def chunk_documents_q(spark, sf_dir) -> DataFrame:
    """Every (doc, chunk) window at size 16 / stride 12 (25% overlap),
    with the chunk content pinned by md5. Narrow zero-shuffle plan —
    the per-row posexplode is the whole operator."""
    chunks = chunk_documents(
        _docs(spark, sf_dir), "doc_id", "text", size=CHUNK_SIZE, stride=CHUNK_STRIDE
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "chunk_start",
        "n_chunk_tokens",
        F.md5(F.col("chunk_text")).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_idx")


def decontamination_summary(spark, sf_dir) -> DataFrame:
    """Per-source contamination report: how many corpus docs share a
    3-gram with the benchmark slice (doc_id % 41 == 0), and the total
    overlapping-gram mass. The benchmark gram set is broadcast."""
    docs = _docs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") % BENCH_MOD == 0)
    corpus = docs.where(F.col("doc_id") % BENCH_MOD != 0)
    overlap = contamination_overlap(corpus, bench, "doc_id", "text", k=3)
    return (
        corpus.join(overlap, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count("n_overlap_grams").alias("n_contaminated"),
            F.sum(F.coalesce("n_overlap_grams", F.lit(0))).alias(
                "total_overlap_grams"
            ),
        )
        .orderBy("source")
    )


def mixture_sample_summary(spark, sf_dir) -> DataFrame:
    """Source-mixture downsample at half the corpus budget with target
    weight (idx+1)/210 for source `src<idx>` — a linear mixture ramp, so
    the kept set skews to high-index sources. Reports the exact
    basis-point rate and what survived per source."""
    docs = _docs(spark, sf_dir)
    weight = (F.substring(F.col("source"), 4, 10).cast("int") + 1) / F.lit(210.0)
    kept = mixture_sample(docs, "doc_id", "source", weight, budget_frac=0.5)
    return (
        kept.groupBy("source", "sample_rate_bp")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("n_chars").alias("chars_sampled"),
        )
        .orderBy("source")
    )


def shuffle_manifest_q(spark, sf_dir) -> DataFrame:
    """Deterministic global-shuffle manifest over 8 shards: per-shard row
    count, total chars, and the md5 of the exact within-shard id order a
    loader would replay. Independent of input partitioning (asserted in
    tests/test_traindata.py)."""
    return shuffle_manifest(
        _docs(spark, sf_dir),
        "doc_id",
        n_shards=N_SHARDS,
        agg_cols={"total_chars": F.sum("n_chars")},
    ).orderBy("shard")


def pack_sequences_q(spark, sf_dir) -> DataFrame:
    """Per-sequence packing manifest at seq_len=128: which docs feed each
    fixed-length training sequence and how many of their tokens land in
    it. Distributed prefix-sum — no single-partition global window."""
    return pack_sequences(
        _docs(spark, sf_dir), "doc_id", "text", seq_len=SEQ_LEN
    ).orderBy("seq_id")


QUERIES = {
    "ext_chunk_documents": chunk_documents_q,
    "ext_pack_sequences": pack_sequences_q,
    "ext_decontamination_summary": decontamination_summary,
    "ext_mixture_sample_summary": mixture_sample_summary,
    "ext_shuffle_manifest": shuffle_manifest_q,
}


_TOKS = "regexp_split_to_array(lower(trim(text)), '\\s+')"
_SHINGLES = (
    "list_distinct(list_transform(range(1, greatest(len(toks)-2, 0) + 1),"
    " i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))"
)

ORACLE = {
    "ext_pack_sequences": f"""
        WITH t AS (SELECT doc_id, len({_TOKS}) AS n FROM documents),
        c AS (
            SELECT doc_id, n,
                   CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS BIGINT) AS start
            FROM t WHERE n > 0
        ),
        s AS (
            SELECT doc_id, n, start,
                   unnest(range(start // {SEQ_LEN},
                                (start + n - 1) // {SEQ_LEN} + 1)) AS seq_id
            FROM c
        )
        SELECT seq_id, COUNT(*) AS n_docs,
               MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
               CAST(SUM(least(start + n, (seq_id + 1) * {SEQ_LEN})
                   - greatest(start, seq_id * {SEQ_LEN})) AS BIGINT) AS n_seq_tokens
        FROM s GROUP BY seq_id ORDER BY seq_id
    """,
    "ext_chunk_documents": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        c AS (
            SELECT doc_id, toks,
                   unnest(range(0, len(toks), {CHUNK_STRIDE})) AS chunk_start
            FROM t WHERE len(toks) > 0
        )
        SELECT doc_id,
               CAST(chunk_start // {CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
               CAST(chunk_start AS INTEGER) AS chunk_start,
               CAST(len(toks[chunk_start + 1 : chunk_start + {CHUNK_SIZE}])
                   AS INTEGER) AS n_chunk_tokens,
               md5(array_to_string(
                   toks[chunk_start + 1 : chunk_start + {CHUNK_SIZE}], ' '))
                   AS chunk_md5
        FROM c ORDER BY doc_id, chunk_idx
    """,
    "ext_decontamination_summary": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        s AS (SELECT doc_id, {_SHINGLES} AS sh FROM t),
        bg AS (SELECT DISTINCT unnest(sh) AS gram FROM s
               WHERE doc_id % {BENCH_MOD} = 0),
        cg AS (SELECT doc_id, unnest(sh) AS gram FROM s
               WHERE doc_id % {BENCH_MOD} <> 0),
        ov AS (SELECT cg.doc_id, COUNT(*) AS n
               FROM cg JOIN bg USING (gram) GROUP BY cg.doc_id)
        SELECT d.source, COUNT(*) AS n_docs, COUNT(ov.n) AS n_contaminated,
               CAST(SUM(COALESCE(ov.n, 0)) AS BIGINT) AS total_overlap_grams
        FROM documents d LEFT JOIN ov USING (doc_id)
        WHERE d.doc_id % {BENCH_MOD} <> 0
        GROUP BY d.source ORDER BY d.source
    """,
    "ext_mixture_sample_summary": f"""
        WITH counts AS (SELECT source, COUNT(*) AS n FROM documents
                        GROUP BY source),
        total AS (SELECT SUM(n) AS t FROM counts),
        rates AS (
            SELECT source,
                   CAST(floor(least(1.0,
                       0.5 * t * ((CAST(substring(source, 4) AS INT) + 1)
                                  / 210.0) / n) * 10000) AS BIGINT)
                       AS sample_rate_bp
            FROM counts, total
        ),
        kept AS (
            SELECT d.source, d.n_chars, r.sample_rate_bp
            FROM documents d JOIN rates r USING (source)
            WHERE (d.doc_id * {KNUTH}) % 10000 < r.sample_rate_bp
        )
        SELECT source, sample_rate_bp, COUNT(*) AS n_sampled,
               CAST(SUM(n_chars) AS BIGINT) AS chars_sampled
        FROM kept GROUP BY source, sample_rate_bp ORDER BY source
    """,
    "ext_shuffle_manifest": f"""
        SELECT (doc_id * {KNUTH}) % {N_SHARDS} AS shard,
               COUNT(*) AS n_rows,
               md5(string_agg(CAST(doc_id AS VARCHAR), ','
                   ORDER BY (doc_id * {PRIME2}) % 2147483648, doc_id))
                   AS order_md5,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY shard ORDER BY shard
    """,
}
