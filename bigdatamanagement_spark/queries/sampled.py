"""sf0.1-verifiable SAMPLED TWINS of the quadratic-oracle dedup family.

The 12 near-dup / curation queries whose DuckDB oracles are deliberate
O(n²) brute-force mirrors cannot be cross-checked at sf0.1 corpus sizes
(5 000 docs → 12.5 M shingle-set intersections ≈ 10 min each). Each twin
here runs the IDENTICAL operator composition on a deterministic block
sample — ``(doc_id DIV 5) % 4 = 1`` keeps id-blocks of 5 so every
mod-BATCH_MOD class survives (the incremental/streaming split needs
class 4), selecting ~25% of docs — and its oracle is the ORIGINAL
brute-force SQL with the base views shadowed by the same predicate.
Non-vacuous at every SF (3 exact-Jaccard pairs at sf0.01, 17 at sf0.1)
while each oracle stays under ~40 s at sf0.1, so the large-SF sweep
needs NO skip list: the full-corpus originals stay verified at
sf0.001/sf0.01 where brute force is feasible, and the same logic is
verified at sf0.1 through these twins.

Twin → original mapping (same operator code path, sampled input):
  ext_s_minhash_lsh_pairs      → extensions.minhash_lsh_pairs
  ext_s_simhash_pairs          → extensions.simhash_pairs
  ext_s_ngram_jaccard_pairs    → extensions.ngram_jaccard_pairs
  ext_s_ngram_containment      → analytics2.ngram_containment_pairs
  ext_s_incremental_neardup    → extensions.incremental_neardup
  ext_s_streaming_neardup      → streaming_pack.streaming_neardup_flags
  ext_s_multi_signal_dedup     → pipeline.multi_signal_dedup_pairs
  ext_s_curation_funnel        → pipeline.curation_funnel
  ext_s_training_set_manifest  → pipeline.training_set_manifest
  ext_s_dedup_clusters         → pipeline.dedup_clusters
  ext_s_dedup_cluster_survivors→ pipeline.dedup_cluster_survivors
  ext_s_leakage_safe_split     → pipeline.leakage_safe_split
  ext_s_trigram_bands          → analytics2.trigram_similarity_bands
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bigdatamanagement_spark.operators import dedup as D
from bigdatamanagement_spark.queries import analytics2 as A2
from bigdatamanagement_spark.queries import extensions as E
from bigdatamanagement_spark.queries import pipeline as P
from bigdatamanagement_spark.queries import streaming_pack as SP
from bigdatamanagement_spark.queries.pipeline import (
    SAMPLE_PRED_SQL as DOC_PRED_SQL,
)

VEC_PRED_SQL = DOC_PRED_SQL.replace("doc_id", "vec_id")
PART_PRED_SQL = "p_partkey % 40 = 3"


def _shadow(sql: str, tables: dict[str, str]) -> str:
    """Prefix CTEs that shadow base views with their sampled subsets.

    DuckDB resolves a CTE named like a view over the view; the CTE body
    reaches the real view through the explicit ``main.`` schema — so the
    original oracle text runs UNCHANGED against the sampled corpus."""
    ctes = ", ".join(
        f"{t} AS (SELECT * FROM main.{t} WHERE {pred})"
        for t, pred in tables.items()
    )
    s = sql.lstrip()
    head = s[:14].upper()
    if head.startswith("WITH RECURSIVE"):
        return "WITH RECURSIVE " + ctes + ", " + s[len("WITH RECURSIVE"):].lstrip()
    if head.startswith("WITH"):
        return "WITH " + ctes + ", " + s[len("WITH"):].lstrip()
    return "WITH " + ctes + " " + s


def _sdocs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P._docs(spark, sf_dir, sampled=True)


def minhash_sampled(spark, sf_dir) -> DataFrame:
    """Twin of ext_minhash_lsh_pairs on the block sample."""
    return D.minhash_lsh_pairs(
        _sdocs(spark, sf_dir), "doc_id", "text", threshold=E.JACCARD_T
    ).orderBy("doc_a", "doc_b")


def simhash_sampled(spark, sf_dir) -> DataFrame:
    """Twin of ext_simhash_pairs on the block sample."""
    return D.simhash_pairs(_sdocs(spark, sf_dir), "doc_id", "text").orderBy(
        "doc_a", "doc_b"
    )


def ngram_jaccard_sampled(spark, sf_dir) -> DataFrame:
    """Twin of ext_ngram_jaccard_pairs on the block sample (the full id
    range, unlike the original's doc_id < 1000 cap)."""
    return D.jaccard_index_pairs(
        _sdocs(spark, sf_dir), "doc_id", "text", threshold=E.JACCARD_T
    ).orderBy("doc_a", "doc_b")


def incremental_sampled(spark, sf_dir) -> DataFrame:
    """Twin of ext_incremental_neardup: the same mod-BATCH_MOD snapshot
    split INSIDE the block sample (signatures rebuilt — the memoized set
    covers the full base)."""
    d = _sdocs(spark, sf_dir)
    base = d.filter(F.col("doc_id") % E.BATCH_MOD != E.BATCH_MOD - 1)
    batch = d.filter(F.col("doc_id") % E.BATCH_MOD == E.BATCH_MOD - 1)
    return D.incremental_minhash_pairs(
        base, batch, "doc_id", "text", threshold=E.JACCARD_T
    ).orderBy("new_doc", "dup_of")


QUERIES = {
    "ext_s_minhash_lsh_pairs": minhash_sampled,
    "ext_s_simhash_pairs": simhash_sampled,
    "ext_s_ngram_jaccard_pairs": ngram_jaccard_sampled,
    "ext_s_ngram_containment": lambda spark, sf: A2.ngram_containment_pairs(
        spark, sf, sampled=True
    ),
    "ext_s_incremental_neardup": incremental_sampled,
    "ext_s_streaming_neardup": lambda spark, sf: SP.streaming_neardup_flags(
        spark, sf, sampled=True
    ),
    "ext_s_multi_signal_dedup": lambda spark, sf: P.multi_signal_dedup_pairs(
        spark, sf, sampled=True
    ),
    "ext_s_curation_funnel": lambda spark, sf: P.curation_funnel(
        spark, sf, sampled=True
    ),
    "ext_s_training_set_manifest": lambda spark, sf: P.training_set_manifest(
        spark, sf, sampled=True
    ),
    "ext_s_dedup_clusters": lambda spark, sf: P.dedup_clusters(
        spark, sf, sampled=True
    ),
    "ext_s_leakage_safe_split": lambda spark, sf: P.leakage_safe_split(
        spark, sf, sampled=True
    ),
    "ext_s_dedup_cluster_survivors": lambda spark, sf: P.dedup_cluster_survivors(
        spark, sf, sampled=True
    ),
    "ext_s_trigram_bands": lambda spark, sf: A2.trigram_similarity_bands(
        spark, sf, sampled=True
    ),
}

_DOCS = {"documents": DOC_PRED_SQL}
_DOCS_EMBS = {"documents": DOC_PRED_SQL, "embeddings": VEC_PRED_SQL}

ORACLE = {
    "ext_s_minhash_lsh_pairs": _shadow(
        E.ORACLE["ext_minhash_lsh_pairs"], _DOCS
    ),
    "ext_s_simhash_pairs": _shadow(E.ORACLE["ext_simhash_pairs"], _DOCS),
    # the original caps at doc_id < 1000; the twin spans the sampled
    # full id range, so refit the base template with no cap
    "ext_s_ngram_jaccard_pairs": _shadow(
        E._JACCARD_BASE.format(brute_max=2**62), _DOCS
    ),
    "ext_s_ngram_containment": _shadow(
        A2.ORACLE["ext_ngram_containment_pairs"], _DOCS
    ),
    "ext_s_incremental_neardup": _shadow(
        E.ORACLE["ext_incremental_neardup"], _DOCS
    ),
    "ext_s_streaming_neardup": _shadow(
        E.ORACLE["ext_incremental_neardup"], _DOCS
    ),
    "ext_s_multi_signal_dedup": _shadow(
        P.ORACLE["ext_multi_signal_dedup"], _DOCS_EMBS
    ),
    "ext_s_curation_funnel": _shadow(P.ORACLE["ext_curation_funnel"], _DOCS),
    "ext_s_training_set_manifest": _shadow(
        P.ORACLE["ext_training_set_manifest"], _DOCS
    ),
    "ext_s_dedup_clusters": _shadow(P.ORACLE["ext_dedup_clusters"], _DOCS),
    "ext_s_leakage_safe_split": _shadow(
        P.ORACLE["ext_leakage_safe_split"], _DOCS
    ),
    "ext_s_dedup_cluster_survivors": _shadow(
        P.ORACLE["ext_dedup_cluster_survivors"], _DOCS
    ),
    "ext_s_trigram_bands": _shadow(
        A2.ORACLE["ext_trigram_similarity_bands"], {"part": PART_PRED_SQL}
    ),
}
