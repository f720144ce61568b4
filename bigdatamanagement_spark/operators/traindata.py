"""Training-set assembly operators (extension surface; SURVEY §7 step 8):
the stages BETWEEN a curated corpus and a tokenizable training set —
fixed-window document chunking, benchmark decontamination, source-mixture
sampling, and deterministic global shuffle.

These complement the curation stages in ``operators/text.py`` /
``operators/dedup.py`` (which decide WHAT to keep); this module decides
HOW the kept corpus is cut, weighed, and ordered for a training run.
Public-algorithm lineage: fixed-stride context chunking and 13-gram
decontamination follow the published GPT-3/PaLM data-prep descriptions
(Brown et al. 2020 §2.2, appendix C); mixture sampling is the
source-weighting step of Pile/DoReMi-style corpus mixing (Gao et al.
2020 §1; Xie et al. 2023 §2); the shuffle manifest is the standard
hash-sharded deterministic permutation used by large-scale data loaders.

All four operators are JVM-expression-only (no Python UDFs) and
shuffle-minimal by design:

- ``chunk_documents`` is a NARROW map (tokenize → slice windows →
  posexplode) — zero shuffles, scales embarrassingly to 100 TB; output
  row count is ~n_tokens/stride per doc.
- ``contamination_overlap`` broadcasts the benchmark gram set (eval
  benchmarks are tiny vs. a 100 TB corpus), so the corpus side is a
  single scan + broadcast semi-join + one doc-keyed partial-agg shuffle.
- ``mixture_sample`` aggregates per-source counts (|sources| rows),
  broadcasts the rate table back, and filters with pure BIGINT hash
  arithmetic — one tiny agg shuffle, then narrow.
- ``shuffle_manifest`` is one shuffle on the shard key; within-shard
  order comes from a second independent hash, so the permutation is
  reproducible on any engine and independent of input partitioning.

Cross-engine determinism: every sampling / sharding decision is a Knuth
multiplicative hash on the BIGINT id (never engine-native ``hash()``/
``rand()``), and sampling thresholds are floored to integer basis points
so Spark and DuckDB compare identical integers.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from bigdatamanagement_spark.operators.text import shingles_from_tokens, tokens

# Knuth multiplicative hash constant (2^32 / golden ratio) and an
# independent odd constant (xxHash PRIME32_2) for the within-shard order:
# two multiplicative hashes of the same key are affinely independent mod
# 2^k, so shard assignment and intra-shard position don't correlate.
KNUTH = 2654435761
PRIME2 = 2246822519


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Cut each document's token stream into fixed-size windows every
    ``stride`` tokens (overlapping when stride < size; the final window
    may be short). Returns one row per (doc, chunk):
    ``(id_col, chunk_idx, chunk_start, n_chunk_tokens, chunk_text)``.

    Narrow plan: tokenize once per row, generate the start offsets with
    ``sequence`` (multiples of stride up to n_tokens-1), ``posexplode``,
    and ``slice`` each window out of the row-local token array — no
    shuffle, no Python. Token-empty documents produce no chunks.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    base = df.select(
        F.col(id_col), toks.alias("_toks"), n.alias("_n")
    ).where(F.col("_n") > 0)
    starts = F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
    exploded = base.select(
        id_col,
        "_toks",
        F.posexplode(starts).alias("chunk_idx", "chunk_start"),
    )
    chunk = F.slice(F.col("_toks"), F.col("chunk_start") + 1, size)
    return exploded.select(
        id_col,
        "chunk_idx",
        "chunk_start",
        F.size(chunk).alias("n_chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


def contamination_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Per-corpus-doc count of distinct k-word shingles that also occur
    anywhere in ``benchmark`` (eval-set decontamination, the n-gram
    overlap check of GPT-3 appendix C). Returns
    ``(id_col, n_overlap_grams)`` for contaminated docs only.

    The benchmark gram set is deduped and broadcast — at real scale the
    benchmark is a few MB of eval data against a 100 TB corpus, so the
    corpus side stays a single scan; the groupBy on the doc id is a
    partial-agg shuffle of only the matching (doc, gram) pairs.
    """
    grams = lambda d: d.select(  # noqa: E731
        F.col(id_col),
        F.explode(shingles_from_tokens(tokens(F.col(text_col)), k)).alias("gram"),
    )
    bench_grams = grams(benchmark).select("gram").distinct()
    return (
        grams(corpus)
        .join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap_grams"))
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weight: Column,
    budget_frac: float = 0.5,
) -> DataFrame:
    """Deterministic source-mixture downsample: keep each source at rate
    ``min(1, budget_frac * total_rows * weight / source_rows)`` so the
    kept set approaches the target mixture proportions given by
    ``weight`` (a column expression over the source name; weights should
    sum to ~1 across sources). Adds ``sample_rate_bp`` (basis points,
    exact integer) and filters to the kept rows.

    The keep decision is ``(id * KNUTH) % 10000 < floor(rate * 10000)``
    — pure BIGINT arithmetic, so membership is reproducible on any
    engine and stable under corpus growth within a source's rate tier.
    One |sources|-row aggregate is broadcast back; no data shuffle.
    """
    counts = df.groupBy(source_col).agg(F.count("*").alias("_src_n"))
    total = counts.agg(F.sum("_src_n").alias("_total"))
    rates = counts.crossJoin(F.broadcast(total)).select(
        source_col,
        F.floor(
            F.least(
                F.lit(1.0),
                F.lit(budget_frac) * F.col("_total") * weight / F.col("_src_n"),
            )
            * 10000
        )
        .cast("bigint")
        .alias("sample_rate_bp"),
    )
    keep = (F.col(id_col) * F.lit(KNUTH)) % 10000 < F.col("sample_rate_bp")
    return df.join(F.broadcast(rates), source_col).where(keep)


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 128,
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Concat-and-split sequence packing — the standard LM training-set
    layout (GPT-3 / Gopher data prep): concatenate every document's token
    stream in ``id_col`` order and cut the stream into fixed ``seq_len``
    blocks; a document may span block boundaries. Returns the per-sequence
    manifest ``(seq_id, n_docs, first_doc, last_doc, n_seq_tokens)`` —
    every sequence holds exactly ``seq_len`` tokens except the last.

    The global token offset of each document is an EXCLUSIVE PREFIX SUM
    in id order — computed distributed, not with a single-partition
    global window (`Window.orderBy` without partitionBy funnels 100 TB
    through one task). Two-phase scan, the same shape as Spark's own
    ``zipWithIndex``:

    1. range-repartition by id, sort within partitions, pin the
       partitioning with ``localCheckpoint`` (offsets and the window pass
       must see the SAME partition boundaries);
    2. per-partition token totals → driver (one row per partition — KB at
       any scale) → exclusive prefix over partition ids, broadcast back;
    3. within-partition running sum (window keyed by the partition id —
       parallel across partitions) + the partition's offset.

    Everything after is narrow: each doc explodes to the ~n/seq_len
    sequence ids it overlaps and one seq-keyed partial aggregate builds
    the manifest. Integer arithmetic end-to-end — bit-stable across
    engines and input partitionings (asserted in tests).
    """
    from pyspark.sql import Window

    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    spark = df.sparkSession
    n_expr = (
        F.col(n_tokens_col) if n_tokens_col else F.size(tokens(F.col(text_col)))
    )
    base = df.select(F.col(id_col).alias("_id"), n_expr.alias("_n")).where(
        F.col("_n") > 0
    )
    n_parts = spark.sparkContext.defaultParallelism
    staged = (
        base.repartitionByRange(n_parts, "_id")
        .sortWithinPartitions("_id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    totals = staged.groupBy("_pid").agg(F.sum("_n").alias("_pt")).collect()
    acc, offsets = 0, []
    for row in sorted(totals, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], acc))
        acc += row["_pt"]
    off = spark.createDataFrame(offsets, schema="_pid int, _poff bigint")
    w = (
        Window.partitionBy("_pid")
        .orderBy("_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pos = staged.join(F.broadcast(off), "_pid").select(
        "_id",
        "_n",
        (F.coalesce(F.sum("_n").over(w), F.lit(0)) + F.col("_poff")).alias("_start"),
    )
    spans = pos.select(
        "_id",
        "_n",
        "_start",
        F.explode(
            F.sequence(
                F.floor(F.col("_start") / seq_len),
                F.floor((F.col("_start") + F.col("_n") - 1) / seq_len),
            )
        ).alias("seq_id"),
    )
    overlap = F.least(
        F.col("_start") + F.col("_n"), (F.col("seq_id") + 1) * seq_len
    ) - F.greatest(F.col("_start"), F.col("seq_id") * seq_len)
    return spans.groupBy("seq_id").agg(
        F.count("*").alias("n_docs"),
        F.min("_id").alias("first_doc"),
        F.max("_id").alias("last_doc"),
        F.sum(overlap).alias("n_seq_tokens"),
    )


def shuffle_manifest(
    df: DataFrame,
    id_col: str,
    n_shards: int = 8,
    agg_cols: dict[str, Column] | None = None,
) -> DataFrame:
    """Deterministic global-shuffle plan: assign every row to shard
    ``(id * KNUTH) % n_shards`` and order within the shard by an
    independent second hash ``(id * PRIME2) % 2^31`` (ties by id). The
    manifest returned has one row per shard with ``n_rows`` and
    ``order_md5`` — MD5 over the comma-joined ordered id list, which
    pins the exact permutation a loader would replay — plus any extra
    ``agg_cols``. One shuffle on the shard key, independent of the
    input's physical partitioning.

    At 100 TB the manifest is the plan and ``write.partitionBy(shard)``
    + a per-partition sort executes it; collecting the ordered id list
    per shard is for verification at test SF (at scale you'd md5 a
    rolling fold instead of materializing the list).
    """
    h2 = (F.col(id_col) * F.lit(PRIME2)) % F.lit(2**31)
    shard = ((F.col(id_col) * F.lit(KNUTH)) % n_shards).alias("shard")
    aggs = [
        F.count("*").alias("n_rows"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(h2.alias("h2"), F.col(id_col).alias("id")))
                    ),
                    lambda s: s["id"].cast("string"),
                ),
            )
        ).alias("order_md5"),
    ] + [c.alias(name) for name, c in (agg_cols or {}).items()]
    return df.withColumn("shard", shard).groupBy("shard").agg(*aggs)
