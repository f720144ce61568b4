"""Training-data pipeline pack: the corpus-curation stages downstream of
the per-doc analyzers in ``queries/extensions.py`` (SURVEY §7 step 8).

Covers: near-dup **cluster** formation (connected components over the
MinHash candidate graph) and canonical-survivor selection; corpus
**vocabulary** (top-k tokens); deterministic **train/val/test hash
split**; token-hash **anonymization** (PII-safe corpus hashing); exact
per-label **embedding centroids**; and a document-length histogram.

Every query here is DuckDB-oracle checked. Cross-engine determinism
tricks used:
- the hash split is pure BIGINT arithmetic (Knuth multiplicative hash
  mod 1000), identical in any SQL engine — never engine-native ``hash()``;
- centroid sums quantize each float to integer micro-units with IEEE
  double ops only and accumulate as BIGINT (exact, order-independent),
  so Spark's and DuckDB's float summation orders cannot drift;
- anonymization compares md5 hex strings, identical across engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bigdatamanagement_spark import cache
from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.session import session_key
from bigdatamanagement_spark.operators import cluster as C
from bigdatamanagement_spark.operators import dedup as D

JACCARD_T = 0.8  # same threshold as the extensions pack's pair finders
ANON_MAX_DOC = 200
KNUTH = 2654435761  # Knuth multiplicative hash constant (2^32 * golden ratio)


# Deterministic block sample for the sf0.1-verifiable twins (queries/
# sampled.py): keep id-blocks of 5 so every mod-BATCH_MOD class stays
# represented (the incremental/streaming split needs class 4), sampling
# 1 in 4 blocks -> ~25% of docs. Non-vacuous at every SF (3 near-dup
# pairs at sf0.01, 17 at sf0.1) while keeping the DuckDB brute-force
# oracles feasible at sf0.1 (~35 s vs ~10 min full-corpus).
SAMPLE_PRED = "(doc_id DIV 5) % 4 = 1"
SAMPLE_PRED_SQL = "(doc_id // 5) % 4 = 1"


def _docs(
    spark: SparkSession, sf_dir: str, sampled: bool = False
) -> DataFrame:
    d = load_testdata(spark, sf_dir, tables=("documents",), register=False)["documents"]
    return d.filter(F.expr(SAMPLE_PRED)) if sampled else d


def _embs(
    spark: SparkSession, sf_dir: str, sampled: bool = False
) -> DataFrame:
    e = load_testdata(spark, sf_dir, tables=("embeddings",), register=False)["embeddings"]
    return (
        e.filter(F.expr(SAMPLE_PRED.replace("doc_id", "vec_id")))
        if sampled
        else e
    )


def _tokens(text):
    return F.split(F.lower(F.trim(text)), r"\s+")


# MinHash candidate pairs are the shared intermediate of both clustering
# queries; materialize once per (session, corpus) — the multi-query
# equivalent of a pipeline stage writing its output for downstream steps.
_PAIRS_MEMO: dict[tuple[str, str], DataFrame] = {}


def _neardup_pairs(
    spark: SparkSession, sf_dir: str, sampled: bool = False
) -> DataFrame:
    key = (session_key(spark), sf_dir, sampled)
    if key not in _PAIRS_MEMO:
        # Full operator output (doc_a, doc_b, jaccard): the verified
        # jaccard column rides along so ext_minhash_lsh_pairs serves
        # from this same artifact instead of re-running the signature +
        # banding pipeline; pipeline consumers select the pair columns.
        _PAIRS_MEMO[key] = cache.persistent_df(
            spark,
            "lexical_pair_graph",
            sf_dir,
            ("documents",),
            f"minhash_lsh J>={JACCARD_T} sampled={sampled} v2",
            lambda: D.minhash_lsh_pairs(
                _docs(spark, sf_dir, sampled), "doc_id", "text",
                threshold=JACCARD_T,
            ),
        )
    return _PAIRS_MEMO[key]


# Cluster labels and repetition metrics are likewise multi-consumer
# intermediates (clusters: dedup_clusters + survivors + funnel — the
# iterative star-contraction would otherwise run three times; repetition:
# filter + funnel). Same memo pattern: one computation per CORPUS —
# content-keyed parquet in .bdm_cache (cache.persistent_df), reloaded
# across sessions; the in-memory dict short-circuits within a session.
_CLUSTERS_MEMO: dict[tuple[str, str], DataFrame] = {}
_REP_MEMO: dict[tuple[str, str], DataFrame] = {}


def _cluster_labels(
    spark: SparkSession, sf_dir: str, sampled: bool = False
) -> DataFrame:
    key = (session_key(spark), sf_dir, sampled)
    if key not in _CLUSTERS_MEMO:
        _CLUSTERS_MEMO[key] = cache.persistent_df(
            spark,
            "cluster_labels",
            sf_dir,
            ("documents",),
            f"star_contraction J>={JACCARD_T} sampled={sampled} v1",
            lambda: C.assign_clusters(
                _docs(spark, sf_dir, sampled),
                "doc_id",
                _neardup_pairs(spark, sf_dir, sampled),
                "doc_a",
                "doc_b",
            ),
        )
    return _CLUSTERS_MEMO[key]


def _repetition(
    spark: SparkSession, sf_dir: str, sampled: bool = False
) -> DataFrame:
    from bigdatamanagement_spark.operators.text import repetition_metrics

    key = (session_key(spark), sf_dir, sampled)
    if key not in _REP_MEMO:
        _REP_MEMO[key] = cache.persistent_df(
            spark,
            "repetition_metrics",
            sf_dir,
            ("documents",),
            f"dup_k=3 sampled={sampled} v1",
            lambda: repetition_metrics(
                _docs(spark, sf_dir, sampled), "doc_id", "text", dup_k=3
            ),
        )
    return _REP_MEMO[key]


# --- near-dup clustering --------------------------------------------------

def dedup_clusters(spark, sf_dir, sampled: bool = False) -> DataFrame:
    """Every document with its near-dup cluster representative: MinHash+LSH
    candidate pairs (J ≥ 0.8, exact-verified) → large-star/small-star
    connected components → min-doc_id label; singletons label themselves.

    This is the stage that turns pairwise dedup output into an actual
    keep/drop decision. Oracle: recursive-CTE transitive closure over the
    brute-force exact-Jaccard pair set (== the LSH pair set on this data,
    recall asserted in tests/test_extensions.py)."""
    return (
        _cluster_labels(spark, sf_dir, sampled)
        .select("doc_id", "cluster_rep")
        .orderBy("doc_id")
    )


def dedup_cluster_survivors(spark, sf_dir, sampled: bool = False) -> DataFrame:
    """Per-source corpus stats after near-dup dedup (keep the min-id doc
    of each cluster): docs kept and chars kept."""
    kept = _cluster_labels(spark, sf_dir, sampled).where(
        F.col("doc_id") == F.col("cluster_rep")
    )
    return (
        kept.groupBy("source")
        .agg(F.count("*").alias("n_kept"), F.sum("n_chars").alias("chars_kept"))
        .orderBy("source")
    )


# --- vocabulary -----------------------------------------------------------

def top_tokens(spark, sf_dir) -> DataFrame:
    """Corpus top-50 tokens by document-token frequency (count desc, token
    asc tiebreak). Map-side partial aggregation makes this one shuffle of
    |vocab| partial counts, not |corpus| tokens."""
    d = _docs(spark, sf_dir)
    return (
        d.select(F.explode(_tokens(F.col("text"))).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(50)
    )


# --- deterministic splits -------------------------------------------------

def hash_split_summary(spark, sf_dir) -> DataFrame:
    """Train/val/test assignment by Knuth multiplicative hash of doc_id
    (90/5/5). Pure integer arithmetic → reproducible on any engine and
    stable under corpus growth (a doc's split never changes when other
    docs are added — the property random sampling lacks)."""
    d = _docs(spark, sf_dir)
    bucket = (F.col("doc_id") * F.lit(KNUTH)) % F.lit(1000)
    split = (
        F.when(bucket < 900, "train").when(bucket < 950, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("split")
    )


def leakage_safe_split(spark, sf_dir, sampled: bool = False) -> DataFrame:
    """Group-aware train/val/test split: the split key is each doc's
    near-dup CLUSTER representative (hash_split_summary's Knuth-hash
    90/5/5 buckets, keyed by cluster_rep instead of doc_id), so a
    near-duplicate family can never straddle splits — the eval-
    contamination mode a doc-keyed split permits. Output: per-split
    doc/cluster/char totals plus BOTH leak counters computed from the
    verified pair set — cluster-keyed (must be 0; computed, not
    asserted) and doc-keyed (the nonzero baseline this operator
    eliminates).

    Scale: split assignment is a projection over the memoized cluster
    labels; the leak counters join the (near-linear, banded) pair set
    to the label table twice and reduce to ONE row that broadcast-joins
    back (keyless 1-row BNLJ — gate-bounded)."""
    labels = _cluster_labels(spark, sf_dir, sampled).select(
        "doc_id", "cluster_rep", "n_chars"
    )

    def split_of(col: str):
        b = (F.col(col) * F.lit(KNUTH)) % F.lit(1000)
        return (
            F.when(b < 900, "train").when(b < 950, "val").otherwise("test")
        )

    assigned = labels.select(
        "doc_id",
        "n_chars",
        "cluster_rep",
        split_of("cluster_rep").alias("split"),
        split_of("doc_id").alias("dsplit"),
    )
    pairs = _neardup_pairs(spark, sf_dir, sampled).select("doc_a", "doc_b")
    a = assigned.select(
        F.col("doc_id").alias("doc_a"),
        F.col("split").alias("sa"),
        F.col("dsplit").alias("da"),
    )
    b = assigned.select(
        F.col("doc_id").alias("doc_b"),
        F.col("split").alias("sb"),
        F.col("dsplit").alias("db"),
    )
    leaks = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("sa") != F.col("sb"), 1).otherwise(0)), F.lit(0)
            ).cast("long").alias("cluster_split_leaked_pairs"),
            F.coalesce(
                F.sum(F.when(F.col("da") != F.col("db"), 1).otherwise(0)), F.lit(0)
            ).cast("long").alias("doc_split_leaked_pairs"),
        )
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("cluster_rep").cast("long").alias("n_clusters"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .join(F.broadcast(leaks))
        .orderBy("split")
    )


# --- anonymization --------------------------------------------------------

def anonymize_tokens(spark, sf_dir) -> DataFrame:
    """Token-hash anonymization: each token replaced by the first 8 hex
    chars of its md5 — structure-preserving, vocabulary-hiding (the shape
    every PII-safe corpus-sharing pipeline needs). Output pins the md5 of
    the anonymized text per doc (bounded to doc_id < 200 to keep the
    compare set small; the transform itself is full-corpus-shaped)."""
    d = _docs(spark, sf_dir).where(F.col("doc_id") < ANON_MAX_DOC)
    anon = F.array_join(
        F.transform(_tokens(F.col("text")), lambda t: F.substring(F.md5(t), 1, 8)), " "
    )
    return d.select(
        "doc_id",
        F.size(_tokens(F.col("text"))).alias("n_tokens"),
        F.md5(anon).alias("anon_hash"),
    ).orderBy("doc_id")


# --- embedding aggregation ------------------------------------------------

def label_centroids(spark, sf_dir) -> DataFrame:
    """Per-label, per-dimension embedding sums (the centroid numerator —
    what an IVF/k-means update step computes). Each float is widened to
    double (exact) and quantized to integer micro-units with IEEE ops
    only (``floor(x*1e6 + 0.5)``), then summed as BIGINT: exact,
    summation-order-independent, and bit-identical across engines —
    engine-native float→decimal casts are NOT (shortest-repr vs full
    binary expansion disagree in the 6th decimal)."""
    e = _embs(spark, sf_dir)
    micro = F.floor(F.col("x").cast("double") * 1000000 + 0.5).cast("long")
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "x"))
        .select("label", (F.col("pos") + 1).alias("dim"), micro.alias("xu"))
        .groupBy("label", "dim")
        .agg(F.sum("xu").alias("dim_sum_micro"), F.count("*").alias("n_vecs"))
        .orderBy("label", "dim")
    )


# --- corpus stats ---------------------------------------------------------

def doc_length_histogram(spark, sf_dir) -> DataFrame:
    """Document-length histogram in 100-char buckets (integer arithmetic)."""
    d = _docs(spark, sf_dir)
    bucket = (F.floor(F.col("n_chars") / 100) * 100).cast("long")
    return (
        d.groupBy(bucket.alias("char_bucket"))
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("char_bucket")
    )


# --- repetition filtering (Gopher-style) ----------------------------------

# Thresholds chosen against the synthetic corpus distributions (median /
# p90 probed at sf0.001: top-token 0.09/0.14, top-bigram 0.03/0.07,
# dup-3gram ~0/0) so both keep=true and keep=false populations exist.
REP_TOP_TOKEN_MAX = 0.125
REP_TOP_BIGRAM_MAX = 0.06
REP_DUP_3GRAM_MAX = 0.02


def repetition_filter(spark, sf_dir) -> DataFrame:
    """Per-doc Gopher-style repetition metrics + keep verdict (Rae et al.
    2021 §A1.1): most-frequent-token fraction, most-frequent-bigram
    fraction, duplicate-3-gram fraction. The keep flag is computed from
    the ROUNDED metrics so the threshold comparison cannot straddle a
    float ulp across engines. See operators/text.py repetition_metrics
    for the single-scan plan shape."""
    m = _repetition(spark, sf_dir)
    keep = (
        (F.col("top_token_frac") <= REP_TOP_TOKEN_MAX)
        & (F.col("top_bigram_frac") <= REP_TOP_BIGRAM_MAX)
        & (F.col("dup_3gram_frac") <= REP_DUP_3GRAM_MAX)
    )
    return m.select(
        "doc_id", "n_tokens", "top_token_frac", "top_bigram_frac",
        "dup_3gram_frac", keep.alias("keep"),
    ).orderBy("doc_id")


# --- end-to-end curation funnel -------------------------------------------

QUALITY_MIN = 0.40  # median quality ≈ 0.45 on this corpus → drops ~1/3


def curation_funnel(spark, sf_dir, sampled: bool = False) -> DataFrame:
    """The composed corpus-curation pipeline in one DataFrame plan:
    quality scoring → repetition filtering → near-dup clustering, with a
    per-(source, verdict) funnel report. Each document gets its FIRST
    failing stage (fixed precedence quality → repetitive →
    near_duplicate) so the funnel counts are deterministic and the
    stages' contributions are disjoint.

    Scale shape: three doc-keyed intermediates (quality projection,
    repetition aggregate, cluster labels) joined on doc_id — all three
    shuffles share the join key, and the MinHash pair graph is the same
    memoized intermediate the clustering queries use (one LSH pass per
    corpus per session, the multi-consumer pipeline-stage pattern); the
    repetition metrics and cluster labels are memoized the same way."""
    from bigdatamanagement_spark.operators.text import quality_score

    docs = _docs(spark, sf_dir, sampled)
    clusters = _cluster_labels(spark, sf_dir, sampled).select("doc_id", "cluster_rep")
    rep_keep = (
        (F.col("top_token_frac") <= REP_TOP_TOKEN_MAX)
        & (F.col("top_bigram_frac") <= REP_TOP_BIGRAM_MAX)
        & (F.col("dup_3gram_frac") <= REP_DUP_3GRAM_MAX)
    )
    rep = _repetition(spark, sf_dir, sampled).select("doc_id", rep_keep.alias("rep_keep"))
    base = docs.select(
        "doc_id", "source", "n_chars", quality_score(F.col("text")).alias("quality")
    )
    verdict = (
        F.when(F.col("quality") < QUALITY_MIN, "low_quality")
        .when(~F.col("rep_keep"), "repetitive")
        .when(F.col("doc_id") != F.col("cluster_rep"), "near_duplicate")
        .otherwise("kept")
    )
    return (
        base.join(rep, "doc_id")
        .join(clusters, "doc_id")
        .select("source", "n_chars", verdict.alias("verdict"))
        .groupBy("source", "verdict")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("source", "verdict")
    )


# --- multi-signal dedup ---------------------------------------------------

NEARDUP_COS = 0.4  # same threshold as the extensions pack's embedding pairs


# Embedding-signal policy switch for multi_signal_dedup_pairs: exact
# triangle-blocked all-pairs is O(n²·d) FLOPs NO MATTER how it is
# blocked (the m=10→30 rehearsal leg measured slope 1.47 trending to
# 2), so above this corpus size the embedding pairs come from the
# sub-quadratic SemDeDup cell-blocked path instead (precision 1.0,
# recall pinned by tests/test_similarity_twins.py). Every oracle-
# checked corpus (sf0.001/0.01/0.1 ≤ 2k vectors, and the sampled twin)
# sits far below the gate, so the DuckDB brute-force oracle stays an
# exact mirror of the active path there; the m=10/30 rehearsal legs
# (20k/60k vectors) exercise the cell path. This is the same
# granularity-scales-with-volume policy as the layout crossover: exact
# while exact is affordable AND verifiable, banded above.
EXACT_EMB_PAIR_LIMIT = 8_000


def multi_signal_dedup_pairs(spark, sf_dir, sampled: bool = False) -> DataFrame:
    """Near-dup pairs from BOTH signals on the doc-aligned id range:
    lexical (MinHash J ≥ 0.8, memoized pair graph) and embedding cosine
    (≥ 0.4), full-outer merged with a method column (lexical /
    embedding / both). This is the production dedup shape: surface-form
    near-dups (boilerplate, templating) and semantic near-dups
    (paraphrase) are different populations, and the method column is
    what a curation pipeline keys its drop policy on.

    The embedding signal is corpus-size-gated (EXACT_EMB_PAIR_LIMIT):
    exact triangle-blocked matmul up to the gate, SemDeDup cell-blocked
    (sub-quadratic, recall-pinned) above it.

    Scale: both pair sets are doc-keyed and sparse; the merge is a
    full-outer sort-merge on the pair key — negligible next to either
    pair finder."""
    from bigdatamanagement_spark.operators import similarity as SIM

    lex = _neardup_pairs(spark, sf_dir, sampled).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b"), F.lit(True).alias("lex")
    )
    doc_ids = _docs(spark, sf_dir, sampled).select("doc_id")
    e = _embs(spark, sf_dir, sampled).join(
        doc_ids, F.col("vec_id") == F.col("doc_id"), "left_semi"
    )
    n_vecs = e.count()  # one scalar to the driver — bounded metadata
    if n_vecs <= EXACT_EMB_PAIR_LIMIT:
        emb_pairs = SIM.blocked_neardup_pairs(
            e, "vec_id", "embedding", NEARDUP_COS
        )
    else:
        emb_pairs = SIM.cell_blocked_neardup_pairs(
            e, "vec_id", "embedding", NEARDUP_COS
        )
    emb = emb_pairs.select(
        F.col("vec_a").alias("a"), F.col("vec_b").alias("b"), F.lit(True).alias("emb")
    )
    method = (
        F.when(F.col("lex") & F.col("emb"), "both")
        .when(F.col("lex"), "lexical")
        .otherwise("embedding")
    )
    return (
        lex.join(emb, ["a", "b"], "full_outer")
        .select(
            F.col("a").alias("doc_a"),
            F.col("b").alias("doc_b"),
            method.alias("method"),
        )
        .orderBy("doc_a", "doc_b")
    )


def training_set_manifest(spark, sf_dir, sampled: bool = False) -> DataFrame:
    """The FULL raw-corpus → packed-training-set pipeline as one plan,
    reported per source: curation survivors (quality → repetition →
    near-dup, the ext_curation_funnel verdicts) → benchmark
    decontamination (survivors sharing any 3-gram with the benchmark
    slice drop; the benchmark slice itself never trains) → fixed-window
    chunking → training-token accounting. The number every pretraining
    run starts from, with per-stage attrition visible.

    Scale: every stage reuses this session's memoized intermediates
    (pair graph, cluster labels, repetition metrics) or broadcasts a
    sublinear set (benchmark grams); the chunker is the narrow
    zero-shuffle posexplode. Four source-keyed aggregates join at the
    end — all O(|sources|)."""
    from bigdatamanagement_spark.operators.text import quality_score
    from bigdatamanagement_spark.operators.traindata import (
        chunk_documents,
        contamination_overlap,
    )
    from bigdatamanagement_spark.queries.traindata import (
        BENCH_MOD,
        CHUNK_SIZE,
        CHUNK_STRIDE,
    )

    docs = _docs(spark, sf_dir, sampled)
    clusters = _cluster_labels(spark, sf_dir, sampled).select("doc_id", "cluster_rep")
    rep_keep = (
        (F.col("top_token_frac") <= REP_TOP_TOKEN_MAX)
        & (F.col("top_bigram_frac") <= REP_TOP_BIGRAM_MAX)
        & (F.col("dup_3gram_frac") <= REP_DUP_3GRAM_MAX)
    )
    rep = _repetition(spark, sf_dir, sampled).select("doc_id", rep_keep.alias("rep_keep"))
    survivors = (
        docs.select("doc_id", "source", "text", quality_score(F.col("text")).alias("q"))
        .join(rep, "doc_id")
        .join(clusters, "doc_id")
        .filter(
            (F.col("q") >= QUALITY_MIN)
            & F.col("rep_keep")
            & (F.col("doc_id") == F.col("cluster_rep"))
        )
        .select("doc_id", "source", "text")
    )
    bench = docs.where(F.col("doc_id") % BENCH_MOD == 0)
    nonbench = survivors.where(F.col("doc_id") % BENCH_MOD != 0)
    contaminated = contamination_overlap(nonbench, bench, "doc_id", "text", k=3)
    clean = nonbench.join(contaminated.select("doc_id"), "doc_id", "left_anti")
    chunks = chunk_documents(
        clean, "doc_id", "text", size=CHUNK_SIZE, stride=CHUNK_STRIDE
    ).join(clean.select("doc_id", "source"), "doc_id")

    raw = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_raw"))
    k = survivors.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))
    c = clean.groupBy("source").agg(F.count(F.lit(1)).alias("n_clean"))
    ch = chunks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_chunk_tokens").cast("long").alias("train_tokens"),
    )
    return (
        raw.join(k, "source", "left")
        .join(c, "source", "left")
        .join(ch, "source", "left")
        .select(
            "source",
            "n_raw",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("n_clean", F.lit(0)).alias("n_clean"),
            F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
            F.coalesce("train_tokens", F.lit(0)).alias("train_tokens"),
        )
        .orderBy("source")
    )


QUERIES = {
    "ext_multi_signal_dedup": multi_signal_dedup_pairs,
    "ext_curation_funnel": curation_funnel,
    "ext_training_set_manifest": training_set_manifest,
    "ext_repetition_filter": repetition_filter,
    "ext_dedup_clusters": dedup_clusters,
    "ext_dedup_cluster_survivors": dedup_cluster_survivors,
    "ext_top_tokens": top_tokens,
    "ext_hash_split_summary": hash_split_summary,
    "ext_leakage_safe_split": leakage_safe_split,
    "ext_anonymize_tokens": anonymize_tokens,
    "ext_label_centroids": label_centroids,
    "ext_doc_length_histogram": doc_length_histogram,
}

# --- DuckDB oracle mirrors ------------------------------------------------

_TOKS = "regexp_split_to_array(lower(trim(text)), '\\s+')"

_SHINGLES = (
    "list_distinct(list_transform(range(1, greatest(len(toks)-2, 0) + 1),"
    " i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))"
)

# Transitive closure of the exact-Jaccard (J >= 0.8) pair graph: min
# reachable doc_id per doc. Small at oracle SF; the Spark side runs the
# scalable star-contraction instead.
_CLUSTERS_CTE = f"""
    WITH RECURSIVE t AS (
        SELECT doc_id, {_SHINGLES} AS sh
        FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
    ),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM t a JOIN t b ON a.doc_id < b.doc_id
        WHERE ROUND(len(list_intersect(a.sh, b.sh)) * 1.0 /
              greatest(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)), 1), 6)
              >= {JACCARD_T}
    ),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(n, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.u, reach.r FROM edges e JOIN reach ON reach.n = e.v
    ),
    clusters AS (
        SELECT n AS doc_id, MIN(r) AS cluster_rep FROM reach GROUP BY n
    )
"""

# Repetition-metric CTE chain (names r-prefixed so it composes with
# _CLUSTERS_CTE in the funnel oracle without collisions).
_REP_CTE = f"""
        rtok AS (SELECT doc_id, {_TOKS} AS ts FROM documents),
        rgrams AS (
          SELECT doc_id, len(ts) AS n_tokens, 1 AS k, g.gram
          FROM rtok, UNNEST(ts) AS g(gram)
          UNION ALL
          SELECT doc_id, len(ts), 2, ts[i] || ' ' || ts[i+1]
          FROM rtok, UNNEST(generate_series(1, len(ts)-1)) AS t(i)
          UNION ALL
          SELECT doc_id, len(ts), 3, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
          FROM rtok, UNNEST(generate_series(1, len(ts)-2)) AS t(i)
        ),
        rcnt AS (
          SELECT doc_id, n_tokens, k, gram, COUNT(*) AS c
          FROM rgrams GROUP BY ALL
        ),
        ragg AS (
          SELECT doc_id, n_tokens, k, MAX(c) AS max_c, SUM(c) AS tot,
                 COUNT(*) AS dist
          FROM rcnt GROUP BY ALL
        ),
        rmetrics AS (
          SELECT doc_id, n_tokens,
            ROUND(MAX(CASE WHEN k=1 THEN max_c::DOUBLE/tot END), 4) AS top_token_frac,
            ROUND(COALESCE(MAX(CASE WHEN k=2 THEN max_c::DOUBLE/tot END), 0.0), 4) AS top_bigram_frac,
            ROUND(COALESCE(MAX(CASE WHEN k=3 THEN (tot-dist)::DOUBLE/tot END), 0.0), 4) AS dup_3gram_frac
          FROM ragg GROUP BY ALL
        ),
        rkeep AS (
          SELECT doc_id, n_tokens, top_token_frac, top_bigram_frac, dup_3gram_frac,
                 (top_token_frac <= {REP_TOP_TOKEN_MAX}
                  AND top_bigram_frac <= {REP_TOP_BIGRAM_MAX}
                  AND dup_3gram_frac <= {REP_DUP_3GRAM_MAX}) AS keep
          FROM rmetrics
        )
"""

from bigdatamanagement_spark.queries.traindata import (
    BENCH_MOD as _TD_BENCH_MOD,
    CHUNK_SIZE as _TD_CHUNK_SIZE,
    CHUNK_STRIDE as _TD_CHUNK_STRIDE,
)

_QUALITY_CTE = f"""
        qdocs AS (
          SELECT doc_id, source, n_chars,
                 ROUND(0.4 * least(len(toks) / 100.0, 1.0)
                     + 0.4 * (len(list_filter(toks, t -> list_contains(
                           ['the','a','and','of','to','in','is','on','for','with'], t))) * 1.0
                         / greatest(len(toks), 1))
                     + 0.2 * (1.0 - (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g'))) * 1.0
                         / greatest(length(text), 1)), 4) AS quality
          FROM (SELECT doc_id, source, n_chars, text, {_TOKS} AS toks FROM documents)
        )
"""

ORACLE = {
    "ext_multi_signal_dedup": f"""
        WITH lt AS (
          SELECT doc_id, {_SHINGLES} AS sh
          FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
        ),
        lex AS (
          SELECT a.doc_id AS a, b.doc_id AS b
          FROM lt a JOIN lt b ON a.doc_id < b.doc_id
          WHERE ROUND(len(list_intersect(a.sh, b.sh)) * 1.0 /
                greatest(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)), 1), 6)
                >= {JACCARD_T}
        ),
        e AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
          WHERE vec_id IN (SELECT doc_id FROM documents)
        ),
        emb AS (
          SELECT a.vec_id AS a, b.vec_id AS b
          FROM e a JOIN e b ON a.vec_id < b.vec_id
          WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= {NEARDUP_COS}
        )
        SELECT COALESCE(l.a, m.a) AS doc_a, COALESCE(l.b, m.b) AS doc_b,
               CASE WHEN l.a IS NOT NULL AND m.a IS NOT NULL THEN 'both'
                    WHEN l.a IS NOT NULL THEN 'lexical'
                    ELSE 'embedding' END AS method
        FROM lex l FULL OUTER JOIN emb m ON l.a = m.a AND l.b = m.b
        ORDER BY doc_a, doc_b
    """,
    "ext_training_set_manifest": _CLUSTERS_CTE
    + ", "
    + _REP_CTE
    + ", "
    + _QUALITY_CTE
    + f""",
        survivors AS (
            SELECT q.doc_id, q.source
            FROM qdocs q
            JOIN rkeep r ON q.doc_id = r.doc_id
            JOIN clusters c ON q.doc_id = c.doc_id
            WHERE q.quality >= {QUALITY_MIN} AND r.keep
              AND c.doc_id = c.cluster_rep
        ),
        toks2 AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        sh2 AS (SELECT doc_id, {_SHINGLES} AS sh FROM toks2),
        bg2 AS (SELECT DISTINCT unnest(sh) AS gram FROM sh2
                WHERE doc_id % {_TD_BENCH_MOD} = 0),
        nonbench AS (SELECT * FROM survivors
                     WHERE doc_id % {_TD_BENCH_MOD} <> 0),
        cont AS (
            SELECT DISTINCT g.doc_id
            FROM (SELECT doc_id, unnest(sh) AS gram FROM sh2) g
            JOIN bg2 USING (gram)
            JOIN nonbench nb ON nb.doc_id = g.doc_id
        ),
        clean AS (
            SELECT nb.* FROM nonbench nb
            LEFT JOIN cont ON nb.doc_id = cont.doc_id
            WHERE cont.doc_id IS NULL
        ),
        chx AS (
            SELECT cl.source,
                   len(cl.toks[cl.cs + 1 : cl.cs + {_TD_CHUNK_SIZE}]) AS n
            FROM (SELECT cl0.doc_id, cl0.source, t0.toks,
                         unnest(range(0, len(t0.toks), {_TD_CHUNK_STRIDE})) AS cs
                  FROM clean cl0 JOIN toks2 t0 USING (doc_id)
                  WHERE len(t0.toks) > 0) AS cl
        ),
        rawc AS (SELECT source, COUNT(*) AS n_raw FROM documents GROUP BY 1),
        kc AS (SELECT source, COUNT(*) AS n_kept FROM survivors GROUP BY 1),
        cc AS (SELECT source, COUNT(*) AS n_clean FROM clean GROUP BY 1),
        chc AS (SELECT source, COUNT(*) AS n_chunks,
                       CAST(SUM(n) AS BIGINT) AS train_tokens
                FROM chx GROUP BY 1)
        SELECT r.source, r.n_raw,
               COALESCE(kc.n_kept, 0) AS n_kept,
               COALESCE(cc.n_clean, 0) AS n_clean,
               COALESCE(chc.n_chunks, 0) AS n_chunks,
               CAST(COALESCE(chc.train_tokens, 0) AS BIGINT) AS train_tokens
        FROM rawc r
        LEFT JOIN kc USING (source)
        LEFT JOIN cc USING (source)
        LEFT JOIN chc USING (source)
        ORDER BY r.source
    """,
    "ext_curation_funnel": _CLUSTERS_CTE
    + ", "
    + _REP_CTE
    + ", "
    + _QUALITY_CTE
    + f"""
        SELECT q.source,
               CASE WHEN q.quality < {QUALITY_MIN} THEN 'low_quality'
                    WHEN NOT r.keep THEN 'repetitive'
                    WHEN c.doc_id <> c.cluster_rep THEN 'near_duplicate'
                    ELSE 'kept' END AS verdict,
               COUNT(*) AS n_docs, CAST(SUM(q.n_chars) AS BIGINT) AS total_chars
        FROM qdocs q
        JOIN rkeep r ON q.doc_id = r.doc_id
        JOIN clusters c ON q.doc_id = c.doc_id
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "ext_repetition_filter": "WITH "
    + _REP_CTE
    + """
        SELECT doc_id, n_tokens, top_token_frac, top_bigram_frac,
               dup_3gram_frac, keep
        FROM rkeep ORDER BY doc_id
    """,
    "ext_dedup_clusters": _CLUSTERS_CTE
    + "SELECT doc_id, cluster_rep FROM clusters ORDER BY doc_id",
    "ext_dedup_cluster_survivors": _CLUSTERS_CTE
    + """
        SELECT d.source, COUNT(*) AS n_kept, CAST(SUM(d.n_chars) AS BIGINT) AS chars_kept
        FROM documents d JOIN clusters c ON d.doc_id = c.doc_id
        WHERE c.doc_id = c.cluster_rep
        GROUP BY d.source ORDER BY d.source
    """,
    "ext_top_tokens": f"""
        SELECT token, COUNT(*) AS n
        FROM (SELECT unnest({_TOKS}) AS token FROM documents)
        WHERE token <> ''
        GROUP BY token ORDER BY n DESC, token ASC LIMIT 50
    """,
    "ext_hash_split_summary": f"""
        SELECT CASE WHEN (doc_id * {KNUTH}) % 1000 < 900 THEN 'train'
                    WHEN (doc_id * {KNUTH}) % 1000 < 950 THEN 'val'
                    ELSE 'test' END AS split,
               COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY 1 ORDER BY 1
    """,
    "ext_leakage_safe_split": _CLUSTERS_CTE
    + f""",
    csplit AS (
        SELECT d.doc_id, d.n_chars, c.cluster_rep,
               CASE WHEN (c.cluster_rep * {KNUTH}) % 1000 < 900 THEN 'train'
                    WHEN (c.cluster_rep * {KNUTH}) % 1000 < 950 THEN 'val'
                    ELSE 'test' END AS split,
               CASE WHEN (d.doc_id * {KNUTH}) % 1000 < 900 THEN 'train'
                    WHEN (d.doc_id * {KNUTH}) % 1000 < 950 THEN 'val'
                    ELSE 'test' END AS dsplit
        FROM documents d JOIN clusters c USING (doc_id)
    ),
    leaks AS (
        SELECT
          CAST(COALESCE(SUM(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS cluster_split_leaked_pairs,
          CAST(COALESCE(SUM(CASE WHEN a.dsplit <> b.dsplit THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS doc_split_leaked_pairs
        FROM pairs p
        JOIN csplit a ON p.doc_a = a.doc_id
        JOIN csplit b ON p.doc_b = b.doc_id
    )
    SELECT s.split, s.n_docs, s.n_clusters, s.total_chars,
           l.cluster_split_leaked_pairs, l.doc_split_leaked_pairs
    FROM (
        SELECT split, COUNT(*) AS n_docs,
               CAST(COUNT(DISTINCT cluster_rep) AS BIGINT) AS n_clusters,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM csplit GROUP BY split
    ) s CROSS JOIN leaks l
    ORDER BY s.split
    """,
    "ext_anonymize_tokens": f"""
        SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens,
               md5(array_to_string(
                   list_transform(toks, t -> substring(md5(t), 1, 8)), ' ')) AS anon_hash
        FROM (SELECT doc_id, {_TOKS} AS toks FROM documents
              WHERE doc_id < {ANON_MAX_DOC})
        ORDER BY doc_id
    """,
    "ext_label_centroids": """
        SELECT label, CAST(i.range AS INTEGER) AS dim,
               CAST(SUM(CAST(floor(CAST(embedding[i.range] AS DOUBLE) * 1000000 + 0.5)
                   AS BIGINT)) AS BIGINT) AS dim_sum_micro,
               COUNT(*) AS n_vecs
        FROM embeddings, range(1, 65) i
        GROUP BY label, i.range ORDER BY label, dim
    """,
    "ext_doc_length_histogram": """
        SELECT (n_chars // 100) * 100 AS char_bucket,
               COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY 1 ORDER BY 1
    """,
}
