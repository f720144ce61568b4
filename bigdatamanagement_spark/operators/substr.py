"""Exact-substring (ExactSubstr) deduplication — Lee, Ippolito et al.,
"Deduplicating Training Data Makes Language Models Better" (ACL 2022).

The paper finds all VERBATIM token spans of length >= K that occur more
than once anywhere in the corpus (their single-node tool builds a
suffix array). A distributed suffix array is impractical; the
equivalent relational construction used here is k-gram seeding +
interval union:

- every duplicated span of length L >= K contains exactly L - K + 1
  duplicated K-grams, and every duplicated K-gram lies inside a
  duplicated span — so the UNION of [pos, pos+K) intervals over
  positions whose K-gram hash repeats corpus-wide is EXACTLY the set of
  tokens inside duplicated spans (no approximation; this is the same
  seed-and-extend identity the paper's suffix-array walk exploits);
- the union length per document is one doc-keyed window: sort seed
  positions, running max of span ends over the preceding frame, count
  only the newly covered tokens.

Reference anchors (SURVEY §2 dedup family): complements exact-hash
(whole doc), MinHash/SimHash (near-dup), and winnowing (selected
fingerprints) with the substring-grain exact layer the modern
training-data stack runs first.

Scale notes (100 TB):
- gram hashing is the winnowing substrate (operators/winnow.py): one
  posexplode + lead() chain riding ONE doc_id-keyed exchange;
- duplicate-gram detection is a gram-hash-keyed aggregate (map-side
  partial count, then the one hash-keyed shuffle every dedup operator
  pays); only hashes ship, never gram text;
- coverage is a doc-keyed window over the SEED rows only (expected a
  few percent of tokens), state = one running max;
- the pair query reuses the df-capped band-join discipline (a
  boilerplate gram shared by millions of docs is dropped by the cap,
  identically on both engines).

The md5-slice hash is the portable 60-bit form both engines compute
bit-identically, so the DuckDB oracle replays the IDENTICAL algorithm.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from bigdatamanagement_spark.operators.text import tokens

K_SUB = 8  # minimum duplicated span length, in tokens


def grams_with_text(
    df: DataFrame, id_col: str, text_col: str, k: int = K_SUB
) -> DataFrame:
    """(doc_id, pos, gram, h): every complete k-token gram with its
    text and portable 60-bit md5-slice hash; tail positions (where
    lead() runs off the document) drop out via concat null-propagation."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts: list[Column] = [F.col("tok")]
    for j in range(1, k):
        parts += [F.lit(" "), F.lead("tok", j).over(w)]
    gram = F.concat(*parts)
    return toks.select("doc_id", "pos", gram.alias("gram")).where(
        F.col("gram").isNotNull()
    ).select(
        "doc_id",
        "pos",
        "gram",
        F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )


def duplicated_seed_positions(
    grams: DataFrame,
) -> DataFrame:
    """(doc_id, pos): positions whose k-gram hash occurs >= 2 times
    corpus-wide (within- and cross-document repeats both count — the
    paper dedups self-repetition too)."""
    dup = (
        grams.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
        .select("h")
    )
    return grams.join(dup, "h").select("doc_id", "pos")


def duplicated_token_coverage(
    seeds: DataFrame, k: int = K_SUB
) -> DataFrame:
    """(doc_id, dup_tokens): per document, the UNION length of the
    [pos, pos+k) intervals over its duplicated seed positions — exactly
    the tokens lying inside >=k-token duplicated spans. One doc-keyed
    window; per-row state is a single running max."""
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_end = F.max(F.col("pos") + k).over(w)
    newly = F.greatest(
        F.lit(0),
        (F.col("pos") + k) - F.greatest(F.coalesce(prev_end, F.lit(0)), F.col("pos")),
    )
    return (
        seeds.select("doc_id", newly.alias("newly"))
        .groupBy("doc_id")
        .agg(F.sum("newly").cast("long").alias("dup_tokens"))
    )


def duplicated_run_spans(seeds: DataFrame, k: int = K_SUB) -> DataFrame:
    """(doc_id, run_id, span_tokens): each MAXIMAL duplicated run — a
    chain of overlapping [pos, pos+k) seed intervals — with its token
    length. A new run starts where a seed's interval does not touch the
    running max end of the preceding intervals; run length is then
    max(pos)+k - min(pos) within the run (interval chains are gap-free
    by construction). Two doc-keyed windows sharing one sort."""
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_end = F.max(F.col("pos") + k).over(w_prev)
    starts = seeds.select(
        "doc_id",
        "pos",
        F.when(
            prev_end.isNull() | (F.col("pos") > prev_end), F.lit(1)
        ).otherwise(F.lit(0)).alias("is_start"),
    )
    runs = starts.select(
        "doc_id", "pos", F.sum("is_start").over(w_run).alias("run_id")
    )
    return (
        runs.groupBy("doc_id", "run_id")
        .agg(
            (F.max("pos") + k - F.min("pos")).cast("long").alias("span_tokens")
        )
    )
