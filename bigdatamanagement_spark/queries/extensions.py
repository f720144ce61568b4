"""Extension pack: training-data-pipeline operators over the driver's
``documents`` / ``embeddings`` tables (SURVEY §7 step 8).

Text analysis, dedup (exact / n-gram Jaccard / MinHash-LSH / SimHash) and
similarity search (brute-force + hyperplane-LSH). Every SQL-expressible
operator ships a DuckDB oracle mirror — including MinHash-LSH, whose
oracle is the brute-force exact-Jaccard pair set (validated locally: the
banding parameters catch every pair above threshold on this data; the
recall bound is also asserted in tests). SimHash runs on PORTABLE
60-bit md5-slice feature hashes (dedup.portable_shingle_hashes), so its
whole pipeline — votes, chunk blocking, Hamming confirm — has an exact
DuckDB mirror. LSH-ANN stays rows-only (hyperplanes from xxhash64,
no DuckDB twin); its quality is pinned by recall tests instead.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.operators import dedup as D
from bigdatamanagement_spark.operators import search as SR
from bigdatamanagement_spark.operators import similarity as S
from bigdatamanagement_spark.operators import text as T
from bigdatamanagement_spark.session import session_key

TOPK_QUERY_IDS = 32  # vec_id < 32 are the ANN query vectors
NEARDUP_COS = 0.4
JACCARD_T = 0.8
# Brute-force pairwise baselines are bounded to keep their O(n²) pair
# space off the bench's critical path at sf>=0.1; the sub-quadratic
# methods (minhash/simhash blocking) run over the FULL corpus. At the
# driver's correctness SF (0.01, 500 docs) the bound is a no-op, so the
# shared oracle SQL stays exact.
BRUTE_MAX_DOC = 1000


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("documents",), register=False)["documents"]


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("embeddings",), register=False)["embeddings"]


# --- text analysis --------------------------------------------------------

def text_features(spark, sf_dir) -> DataFrame:
    """Per-document text features: token counts, lang-ID, quality,
    fingerprint — the per-row map stage of a pretraining pipeline."""
    return T.with_text_features(_docs(spark, sf_dir)).select(
        "doc_id", "token_count", "bpe_token_count", "lang_pred", "quality", "fingerprint"
    )


def lang_distribution(spark, sf_dir) -> DataFrame:
    """Predicted-language histogram."""
    d = _docs(spark, sf_dir)
    return (
        d.select(T.lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang_pred")
    )


def profile_documents(spark, sf_dir) -> DataFrame:
    """Single-pass column profile of the documents corpus (null counts,
    exact distinct cardinality, min/max) — the pre-ingest audit."""
    from bigdatamanagement_spark.operators.profile import profile_table

    return profile_table(_docs(spark, sf_dir)).orderBy("col_name")


def unigram_logprob_quality(spark, sf_dir) -> DataFrame:
    """Corpus-unigram-LM quality scores per document (perplexity-proxy
    filter): mean token log-prob in integer micro-nats + rare-token basis
    points. Integer-stable across engines — see
    ``operators/text.unigram_lm_scores``."""
    return T.unigram_lm_scores(_docs(spark, sf_dir)).orderBy("doc_id")


# Bag-of-words query for the BM25 entry — mid-frequency domain terms.
BM25_QUERY = ["spark", "join", "stream"]
# Incremental dedup: every 5th doc plays the "new crawl snapshot".
BATCH_MOD = 5


def tfidf_top_terms(spark, sf_dir) -> DataFrame:
    """Top-3 characteristic terms per document by TF-IDF (integer-micro
    scores; the keyword-extraction stage of a curation pipeline)."""
    return SR.tfidf_top_terms(_docs(spark, sf_dir), k=3).orderBy("doc_id", "rank")


def bm25_search(spark, sf_dir) -> DataFrame:
    """Okapi BM25 top-10 documents for a fixed bag-of-words query — the
    engine-side RediSearch upgrade (see operators/search.py)."""
    return SR.bm25_search(_docs(spark, sf_dir), BM25_QUERY, topk=10).orderBy("rank")


def countmin_tokens(spark, sf_dir) -> DataFrame:
    """Count-min sketch (4×64, md5-sliced buckets) probed for the exact
    top-20 tokens: (term, exact_cnt, cm_est), cm_est ≥ exact_cnt always
    (one-sided error). The sketch is the mergeable bounded-memory
    replacement for an exact vocab count at 100 TB; the exact counts
    here exist to exhibit the error bound (operators/sketch.py)."""
    from bigdatamanagement_spark.operators import sketch as SK

    occ = (
        _docs(spark, sf_dir)
        .select(F.explode_outer(T.tokens(F.col("text"))).alias("term"))
        .filter(F.col("term").isNotNull())
    )
    sk = SK.countmin_build(occ, depth=4, width=64)
    exact = occ.groupBy("term").agg(F.count("*").alias("exact_cnt"))
    probes = exact.orderBy(F.desc("exact_cnt"), "term").limit(20)
    est = SK.countmin_probe(sk, probes.select("term"), depth=4, width=64)
    return (
        probes.join(est, "term")
        .select("term", "exact_cnt", "cm_est")
        .orderBy(F.desc("exact_cnt"), "term")
    )


BLOOM_SEGMENT = "BUILDING"
BLOOM_M = 4096
BLOOM_K = 4


def bloom_semijoin_filter(spark, sf_dir) -> DataFrame:
    """Bloom-filter runtime semi-join pre-filter (operators/sketch.py):
    build a 4096-bit/4-hash bloom over the custkeys of one market
    segment, probe every distinct orders custkey, and report the
    one-sided membership outcome — (n_probe_keys, n_bloom_pass,
    n_true_match, n_false_pos). n_bloom_pass ≥ n_true_match always and
    n_false_pos is the ~0.4% overshoot; at 100 TB this bit set is what
    gets broadcast to drop fact rows BEFORE the join shuffle (Spark's
    runtime row-level filtering does this implicitly; this is the
    explicit cross-engine-checkable form)."""
    from bigdatamanagement_spark.operators import sketch as SK

    t = load_testdata(spark, sf_dir, tables=("customer", "orders"), register=False)
    dim = (
        t["customer"]
        .filter(F.col("c_mktsegment") == BLOOM_SEGMENT)
        .select(F.col("c_custkey").alias("key"))
    )
    bloom = SK.bloom_build(dim, "key", m_bits=BLOOM_M, k=BLOOM_K)
    probes = t["orders"].select(F.col("o_custkey").alias("key")).distinct()
    passed = SK.bloom_probe(bloom, probes, "key", m_bits=BLOOM_M, k=BLOOM_K)
    flagged = passed.join(
        F.broadcast(dim.withColumn("is_true", F.lit(1))), "key", "left"
    ).select("bloom_pass", F.coalesce(F.col("is_true"), F.lit(0)).alias("is_true"))
    return flagged.agg(
        F.count("*").cast("long").alias("n_probe_keys"),
        F.sum("bloom_pass").cast("long").alias("n_bloom_pass"),
        F.sum("is_true").cast("long").alias("n_true_match"),
        F.sum(((F.col("bloom_pass") == 1) & (F.col("is_true") == 0)).cast("int"))
        .cast("long")
        .alias("n_false_pos"),
    )


_FUZZY_MEMO: dict[tuple[str, str], DataFrame] = {}


def _fuzzy_pair_graph(spark, sf_dir) -> DataFrame:
    """(rec_a, rec_b, dist): the blocked-Levenshtein customer pair graph
    — consumed by both ext_fuzzy_name_pairs and the t25 golden-record
    merge (which eagerly materializes it inside star contraction), so it
    follows the same per-(session, corpus) ingest-artifact memo as the
    lexical/simhash pair graphs."""
    from bigdatamanagement_spark import cache
    from bigdatamanagement_spark.operators.linkage import blocked_fuzzy_pairs

    key = (session_key(spark), sf_dir)
    if key not in _FUZZY_MEMO:
        _FUZZY_MEMO[key] = cache.persistent_df(
            spark,
            "fuzzy_pair_graph",
            sf_dir,
            ("customer",),
            "levenshtein<=2 block=nation v1",
            lambda: blocked_fuzzy_pairs(
                load_testdata(
                    spark, sf_dir, tables=("customer",), register=False
                )["customer"],
                "c_custkey",
                "c_name",
                "c_nationkey",
                max_dist=2,
            ),
        )
    return _FUZZY_MEMO[key]


def fuzzy_name_pairs(spark, sf_dir) -> DataFrame:
    """Record linkage over the customer table: within-nation customer
    pairs whose names are ≤ 2 edits apart (operators/linkage.py) —
    blocked Levenshtein with threshold early-exit, served from the
    fuzzy_pair_graph ingest artifact."""
    return _fuzzy_pair_graph(spark, sf_dir).orderBy("rec_a", "rec_b")


def source_kl_divergence(spark, sf_dir) -> DataFrame:
    """Per-source KL divergence of the source's unigram distribution from
    the corpus distribution, in integer micro-nats: (source, n_tokens,
    kl_micro). The mixture-drift monitor of a multi-source pretraining
    pipeline — a source whose KL jumps between snapshots changed its
    content mix.

    Determinism: each (source, token) term p_s·ln(p_s/p_c) is rounded to
    integer micros BEFORE the per-source sum (aggregation-order-proof;
    the same discipline as unigram_lm_scores). All counts flow from ONE
    (source, token)-keyed aggregate; the vocab totals broadcast back
    (token-keyed sort-merge join at 100 TB vocab sizes).
    """
    d = _docs(spark, sf_dir)
    occ = d.select(
        "source", F.explode_outer(T.tokens(F.col("text"))).alias("term")
    ).filter(F.col("term").isNotNull())
    st = occ.groupBy("source", "term").agg(F.count("*").alias("c_st"))
    s_tot = st.groupBy("source").agg(F.sum("c_st").alias("total_s"))
    t_tot = st.groupBy("term").agg(F.sum("c_st").alias("c_t"))
    tot = t_tot.agg(F.sum("c_t").alias("total"))
    ps = F.col("c_st").cast("double") / F.col("total_s")
    pc = F.col("c_t").cast("double") / F.col("total")
    tm = F.round(F.lit(1000000.0) * ps * F.log(ps / pc), 0).cast("long")
    terms = (
        st.join(F.broadcast(s_tot), "source")
        .join(F.broadcast(t_tot), "term")
        .join(F.broadcast(tot))
        .select("source", tm.alias("tm"))
    )
    return (
        terms.groupBy("source")
        .agg(F.sum("tm").alias("kl_micro"))
        .join(F.broadcast(s_tot), "source")
        .select("source", F.col("total_s").alias("n_tokens"), "kl_micro")
        .orderBy("source")
    )


# --- dedup ----------------------------------------------------------------


# The standing corpus's MinHash signatures: the at-ingest index both
# the batch and streaming incremental-dedup entries probe — built once
# per (session, corpus), like the IVF centroids and PQ codes.
_BASE_SIGS: dict[tuple[str, str], DataFrame] = {}


def base_minhash_signatures(spark, sf_dir) -> DataFrame:
    key = (session_key(spark), sf_dir)
    if key not in _BASE_SIGS:
        base = _docs(spark, sf_dir).filter(
            F.col("doc_id") % BATCH_MOD != BATCH_MOD - 1
        )
        _BASE_SIGS[key] = D.minhash_signatures(
            base, "doc_id", "text", 64, 3
        ).localCheckpoint(eager=True)
    return _BASE_SIGS[key]


def incremental_neardup(spark, sf_dir) -> DataFrame:
    """Near-dup pairs of a simulated incoming snapshot (doc_id ≡ 4 mod 5)
    against the standing corpus (the rest): the incremental-dedup shape —
    base×base pairs are never enumerated. MinHash-banded candidates,
    exact-Jaccard verified; the oracle is the exact cross-sided Jaccard
    scan (LSH recall = 1 on this corpus, pinned corpus-wide in tests)."""
    d = _docs(spark, sf_dir)
    base = d.filter(F.col("doc_id") % BATCH_MOD != BATCH_MOD - 1)
    batch = d.filter(F.col("doc_id") % BATCH_MOD == BATCH_MOD - 1)
    return D.incremental_minhash_pairs(
        base, batch, "doc_id", "text", threshold=JACCARD_T,
        base_signatures=base_minhash_signatures(spark, sf_dir),
    ).orderBy("new_doc", "dup_of")

def dedup_exact_groups(spark, sf_dir) -> DataFrame:
    """Exact-duplicate groups by md5(text)."""
    return D.exact_dedup_groups(_docs(spark, sf_dir), "doc_id", "text").orderBy("text_hash")


def dedup_exact_survivors(spark, sf_dir) -> DataFrame:
    """Row count before/after exact dedup."""
    d = _docs(spark, sf_dir)
    kept = D.exact_dedup(d, "doc_id", "text")
    return d.agg(F.count("*").alias("n_before")).crossJoin(
        kept.agg(F.count("*").alias("n_after"))
    )


def ngram_jaccard_pairs(spark, sf_dir) -> DataFrame:
    """3-gram-shingle Jaccard near-dup pairs (J ≥ 0.8) via the
    prefix-filtered inverted-index join — provably the same result set as
    the brute-force quadratic scan (equality asserted in tests), produced
    without materializing the O(n²) pair space."""
    return D.jaccard_index_pairs(
        _docs(spark, sf_dir).filter(F.col("doc_id") < BRUTE_MAX_DOC),
        "doc_id",
        "text",
        threshold=JACCARD_T,
    ).orderBy("doc_a", "doc_b")


def minhash_lsh_pairs(spark, sf_dir) -> DataFrame:
    """MinHash(64)+LSH(16×4) near-dup pairs, exact-Jaccard verified —
    served from the lexical_pair_graph ingest artifact (the memo the
    whole dedup pipeline family shares), which persists the operator's
    full (doc_a, doc_b, jaccard) output."""
    from bigdatamanagement_spark.queries.pipeline import _neardup_pairs

    return _neardup_pairs(spark, sf_dir).orderBy("doc_a", "doc_b")


_SIMHASH_MEMO: dict[tuple[str, str], DataFrame] = {}


def _simhash_pair_graph(spark, sf_dir) -> DataFrame:
    """(doc_a, doc_b, hamming): the SimHash-60 near-dup pair graph over
    the full corpus — a multi-consumer ingest artifact exactly like the
    MinHash ``lexical_pair_graph`` memo (pipeline._neardup_pairs): both
    ext_simhash_pairs and the t64 dedup-token-yield waterfall consume the
    same pair set, and in production it is built once per corpus at
    index time. Same memo discipline: in-session dict + content-keyed
    parquet via cache.persistent_df (per-invocation scratch in fresh
    mode, so bench/oracle runs always compute it from the inputs)."""
    from bigdatamanagement_spark import cache

    key = (session_key(spark), sf_dir)
    if key not in _SIMHASH_MEMO:
        _SIMHASH_MEMO[key] = cache.persistent_df(
            spark,
            "simhash_pair_graph",
            sf_dir,
            ("documents",),
            "simhash bits=60 hamming<=8 v1",
            lambda: D.simhash_pairs(_docs(spark, sf_dir), "doc_id", "text"),
        )
    return _SIMHASH_MEMO[key]


def simhash_pairs(spark, sf_dir) -> DataFrame:
    """Portable SimHash-60 near-dup pairs (hamming ≤ 8, md5-slice feature
    hashes, 15-bit chunk blocking) — oracle-checked bit-for-bit."""
    return _simhash_pair_graph(spark, sf_dir).orderBy("doc_a", "doc_b")


# --- similarity search ----------------------------------------------------

def embedding_neardup_pairs(spark, sf_dir) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos ≥ 0.4 on this corpus) via the
    triangle-blocked numpy matmul operator (Arrow-batched applyInPandas);
    equality with the JVM zip_with brute force is asserted in tests."""
    e = _embs(spark, sf_dir).filter(F.col("vec_id") < BRUTE_MAX_DOC)
    return S.blocked_neardup_pairs(e, "vec_id", "embedding", NEARDUP_COS).orderBy(
        "vec_a", "vec_b"
    )


def embedding_neardup_pairs_brute(spark, sf_dir) -> DataFrame:
    """JVM-side brute-force baseline for the blocked operator (tests only).

    Norms are precomputed per row so the per-pair work is one dot."""
    e = _embs(spark, sf_dir).filter(F.col("vec_id") < BRUTE_MAX_DOC)
    v = F.col("embedding").cast("array<double>")
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda s, x: s + x * x))
    e = e.select("vec_id", v.alias("v"), norm.alias("nrm"))
    a, b = e.alias("a"), e.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= NEARDUP_COS)
        .orderBy("vec_a", "vec_b")
    )


def cosine_topk(spark, sf_dir) -> DataFrame:
    """Exact top-10 cosine neighbors for query vectors (vec_id < 32)."""
    e = _embs(spark, sf_dir)
    queries = e.filter(F.col("vec_id") < TOPK_QUERY_IDS)
    return S.cosine_topk(e, queries, k=10).orderBy("query_id", "rank")


def lsh_ann_topk(spark, sf_dir) -> DataFrame:
    """Approximate top-10 via hyperplane LSH; rows-only check (recall is
    asserted against cosine_topk in tests)."""
    e = _embs(spark, sf_dir)
    queries = e.filter(F.col("vec_id") < TOPK_QUERY_IDS)
    # near-random 64-dim corpus: shallow buckets (4 bits), more tables (8)
    return S.lsh_topk(e, queries, k=10, n_planes=4, n_tables=8).orderBy("query_id", "rank")


def multiprobe_lsh_ann_topk(spark, sf_dir) -> DataFrame:
    """Trained multi-probe LSH top-10 (P = 2 lowest-margin flips per
    table); rows-only check — the integer mechanics are oracle-checked
    by the T74 fixed twin (analytics56) and recall dominance over the
    single-probe run is pinned in tests/test_extensions.py."""
    e = _embs(spark, sf_dir)
    queries = e.filter(F.col("vec_id") < TOPK_QUERY_IDS)
    return S.lsh_topk(
        e, queries, k=10, n_planes=4, n_tables=8, multi_probe=2
    ).orderBy("query_id", "rank")


# Trained IVF centroids per (session, corpus): training is the expensive
# phase (each Lloyd iteration is a Spark job) and in production happens
# once at index-build time, not per query — the memo models exactly that.
_IVF_CENTROIDS: dict[tuple[str, str], list[list[float]]] = {}


def _ivf_centroids(spark, sf_dir, e: DataFrame) -> list[list[float]]:
    """Per-corpus trained coarse quantizer — index-build phase, trained
    once (one Spark job per Lloyd iteration; happens at write time in
    production, not per query) and persisted content-keyed in
    .bdm_cache so later sessions reload instead of retraining."""
    from bigdatamanagement_spark import cache

    key = (session_key(spark), sf_dir)
    if key not in _IVF_CENTROIDS:
        _IVF_CENTROIDS[key] = cache.persistent_json(
            "ivf_centroids",
            sf_dir,
            ("embeddings",),
            "k=8 iters=8 v1",
            lambda: S.kmeans_centroids(e, "embedding", n_cells=8, max_iter=8),
        )
    return _IVF_CENTROIDS[key]


def ivf_ann_topk(spark, sf_dir) -> DataFrame:
    """Approximate top-10 via an IVF (k-means cell) index; rows-only check
    (recall asserted against cosine_topk in tests — k-means training is
    not SQL-expressible for the DuckDB oracle)."""
    e = _embs(spark, sf_dir)
    queries = e.filter(F.col("vec_id") < TOPK_QUERY_IDS)
    # near-random 64-dim corpus: few coarse cells, probe half of them.
    # max_iter=8: coarse-quantizer quality plateaus fast and each Lloyd
    # iteration is a full Spark job — recall is pinned by the test either way.
    return S.ivf_topk(
        e, queries, k=10, n_cells=8, nprobe=4,
        centroids=_ivf_centroids(spark, sf_dir, e),
    ).orderBy("query_id", "rank")


_PQ_CODEBOOKS: dict[tuple[str, str], list] = {}


def _pq_codebooks(spark, sf_dir, e: DataFrame) -> list:
    """Per-(session, corpus) trained PQ codebooks — index-build phase,
    memoized like the IVF coarse quantizer."""
    key = (session_key(spark), sf_dir)
    if key not in _PQ_CODEBOOKS:
        # Codebooks train on a deterministic 1/4 sample (standard PQ
        # practice — Jégou et al. train on a subset); each of the m
        # subspace fits is a Spark job, so the sample + short Lloyd runs
        # keep index-build bounded while recall is pinned by the test.
        sample = e.filter(F.col("vec_id") % 4 == 0)
        books = S.pq_train_codebooks(sample, "embedding", m=8, ksub=16, max_iter=4)
        # the encoded corpus is part of the index build: store codes too
        _PQ_CODEBOOKS[key] = (books, S.pq_encode(e, books))
    return _PQ_CODEBOOKS[key]


def pq_ann_topk(spark, sf_dir) -> DataFrame:
    """Approximate top-10 via product quantization with ADC scoring and
    exact re-rank of the top-50 shortlist (operators/similarity.pq_topk);
    rows-only check — k-means codebook training is not SQL-expressible.
    Recall vs the exact baseline is pinned in tests. The compression
    path for 100 TB ANN: the scoring join ships 8 small ints per corpus
    vector instead of 64 floats."""
    e = _embs(spark, sf_dir)
    queries = e.filter(F.col("vec_id") < TOPK_QUERY_IDS)
    books, codes = _pq_codebooks(spark, sf_dir, e)
    return S.pq_topk(
        e, queries, k=10, m=8, ksub=16, refine=100,
        codebooks=books, codes=codes,
    ).orderBy("query_id", "rank")


# SemDeDup target cell size: per-cell pairwise work is (cell size)^2,
# so n_cells MUST grow with the corpus (Abbas et al. use ~1e5 cells at
# web scale). The m=30 scale rehearsal measured the fixed-8-cell
# version entering its quadratic regime (5 s -> 108 s for 3x data,
# alpha 1.20) — exactly the docstring's "bounded when n_cells grows"
# caveat turned into a number. Cells are trained per corpus at index-
# build time (memoized like the IVF quantizer); at the driver SFs
# (<= 2000 vectors) n_cells stays 8, so oracle-facing behavior is
# unchanged.
SEMDEDUP_CELL_TARGET = 500
_SEMDEDUP_CENTROIDS: dict[tuple[str, str], list[list[float]]] = {}


def _semdedup_cache_path(sf_dir: str) -> str | None:
    """Disk-cache path for this corpus's trained centroids, keyed on the
    embeddings file's identity (path + size + mtime) so a regenerated
    corpus retrains. None when the corpus has no stable file to key on."""
    import hashlib
    import os

    emb = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(emb)
    except OSError:
        return None
    key = hashlib.sha1(
        f"{os.path.abspath(emb)}|{st.st_size}|{int(st.st_mtime)}|"
        f"{SEMDEDUP_CELL_TARGET}".encode()
    ).hexdigest()[:16]
    from bigdatamanagement_spark import cache as _cache

    # routed through cache.artifact_path so fresh mode (bench/sim)
    # redirects this artifact with the rest of the .bdm_cache family
    return _cache.artifact_path("semdedup_centroids", key) + ".json"


def _semdedup_centroids(spark, sf_dir, e: DataFrame) -> list[list[float]]:
    """Trained cells for this corpus — the index-build artifact. Like
    the IVF/PQ stores and the ann_params fixture, training happens ONCE
    per corpus: the k-means result persists to a content-keyed disk
    cache, so a new session reloads (~ms) instead of retraining (~3 s
    at sf0.1). The in-memory memo still short-circuits within a session."""
    import json
    import os

    key = (session_key(spark), sf_dir)
    if key not in _SEMDEDUP_CENTROIDS:
        cache = _semdedup_cache_path(sf_dir)
        if cache is not None and os.path.exists(cache):
            with open(cache) as fh:
                _SEMDEDUP_CENTROIDS[key] = json.load(fh)
        else:
            n = e.count()  # bounded metadata (one scalar)
            n_cells = max(8, n // SEMDEDUP_CELL_TARGET)
            cents = S.kmeans_centroids(e, "embedding", n_cells=n_cells, max_iter=8)
            _SEMDEDUP_CENTROIDS[key] = cents
            if cache is not None:
                os.makedirs(os.path.dirname(cache), exist_ok=True)
                tmp = cache + ".tmp"
                with open(tmp, "w") as fh:
                    json.dump(cents, fh)
                os.replace(tmp, cache)  # atomic: concurrent sessions race safely
    return _SEMDEDUP_CENTROIDS[key]


def semdedup_summary(spark, sf_dir) -> DataFrame:
    """SemDeDup semantic dedup over the embedding corpus (per-cluster
    pairwise cosine inside corpus-scaled k-means cells): per-cell
    vector/duplicate counts. Rows-only check — k-means training is not
    SQL-expressible; the drop policy and its containment in the exact
    near-dup pair set are pinned in tests. n_cells scales with the
    corpus (target cell ~1000 vectors) so the per-cell pairwise stage
    stays near-linear — see SCALE.md m=30 rehearsal."""
    e = _embs(spark, sf_dir)
    flags = S.semantic_dedup(
        e, "vec_id", "embedding", threshold=NEARDUP_COS,
        centroids=_semdedup_centroids(spark, sf_dir, e),
    )
    return (
        flags.groupBy("cell")
        .agg(
            F.count("*").alias("n_vectors"),
            F.sum(F.col("is_dup").cast("long")).alias("n_duplicates"),
        )
        .orderBy("cell")
    )


QUERIES = {
    "ext_text_features": text_features,
    "ext_lang_distribution": lang_distribution,
    "ext_unigram_logprob_quality": unigram_logprob_quality,
    "ext_profile_documents": profile_documents,
    "ext_tfidf_top_terms": tfidf_top_terms,
    "ext_bm25_search": bm25_search,
    "ext_incremental_neardup": incremental_neardup,
    "ext_countmin_tokens": countmin_tokens,
    "ext_bloom_semijoin_filter": bloom_semijoin_filter,
    "ext_source_kl_divergence": source_kl_divergence,
    "ext_fuzzy_name_pairs": fuzzy_name_pairs,
    "ext_dedup_exact_groups": dedup_exact_groups,
    "ext_dedup_exact_survivors": dedup_exact_survivors,
    "ext_ngram_jaccard_pairs": ngram_jaccard_pairs,
    "ext_minhash_lsh_pairs": minhash_lsh_pairs,
    "ext_simhash_pairs": simhash_pairs,
    "ext_embedding_neardup_pairs": embedding_neardup_pairs,
    "ext_cosine_topk": cosine_topk,
    "ext_lsh_ann_topk": lsh_ann_topk,
    "ext_multiprobe_lsh_ann_topk": multiprobe_lsh_ann_topk,
    "ext_ivf_ann_topk": ivf_ann_topk,
    "ext_pq_ann_topk": pq_ann_topk,
    "ext_semdedup_summary": semdedup_summary,
}

# --- DuckDB oracle mirrors ------------------------------------------------

_STOP = {k: "[" + ", ".join(f"'{w}'" for w in v) + "]" for k, v in T.LANG_STOPWORDS.items()}

_TOKS = "regexp_split_to_array(lower(trim(text)), '\\s+')"

_LANG_CASE = f"""
    CASE WHEN hits_en >= hits_de AND hits_en >= hits_es AND hits_en >= hits_fr THEN 'en'
         WHEN hits_de >= hits_es AND hits_de >= hits_fr THEN 'de'
         WHEN hits_es >= hits_fr THEN 'es'
         ELSE 'fr' END
"""

_HITS = ", ".join(
    f"len(list_intersect(list_distinct({_TOKS}), {_STOP[c]})) AS hits_{c}" for c in T.LANG_STOPWORDS
)

_SHINGLES = (
    "list_distinct(list_transform(range(1, greatest(len(toks)-2, 0) + 1),"
    " i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))"
)

_JACCARD_BASE = f"""
    WITH t AS (
        SELECT doc_id, {_SHINGLES} AS sh
        FROM (SELECT doc_id, {_TOKS} AS toks FROM documents
              WHERE doc_id < {{brute_max}})
    ),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               ROUND(len(list_intersect(a.sh, b.sh)) * 1.0 /
                     greatest(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)), 1), 6) AS jaccard
        FROM t a JOIN t b ON a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= {JACCARD_T}
    ORDER BY doc_a, doc_b
"""

_BM25_TERMS = ", ".join(f"'{t}'" for t in BM25_QUERY)

_BLOOM_BIT = (
    "(('0x' || substring(md5(key::VARCHAR), CAST(i * 8 + 1 AS INT), 8))::BIGINT)"
    f" % {BLOOM_M}"
)

ORACLE = {
    "ext_bloom_semijoin_filter": f"""
        WITH dim AS (SELECT c_custkey AS key FROM customer
                     WHERE c_mktsegment = '{BLOOM_SEGMENT}'),
        bits AS (SELECT DISTINCT {_BLOOM_BIT} AS bit
                 FROM dim CROSS JOIN range({BLOOM_K}) t(i)),
        probes AS (SELECT DISTINCT o_custkey AS key FROM orders),
        pk AS (SELECT key, {_BLOOM_BIT} AS bit
               FROM probes CROSS JOIN range({BLOOM_K}) t(i)),
        passed AS (
            SELECT key,
                   CASE WHEN SUM(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END)
                             = {BLOOM_K} THEN 1 ELSE 0 END AS bloom_pass
            FROM pk LEFT JOIN bits b USING (bit) GROUP BY key
        ),
        flagged AS (
            SELECT p.bloom_pass,
                   CASE WHEN d.key IS NOT NULL THEN 1 ELSE 0 END AS is_true
            FROM passed p LEFT JOIN dim d ON d.key = p.key
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_probe_keys,
               CAST(SUM(bloom_pass) AS BIGINT) AS n_bloom_pass,
               CAST(SUM(is_true) AS BIGINT) AS n_true_match,
               CAST(SUM(CASE WHEN bloom_pass = 1 AND is_true = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_false_pos
        FROM flagged
    """,
    # Portable SimHash mirror: same 60-bit md5-slice feature hashes, same
    # majority-vote bit rule (2·ones > n), same 4×15-bit chunk blocking,
    # same Hamming confirm — docs with no shingles carry signature 0 on
    # both engines (Spark's fold over an empty array sets no bits).
    "ext_simhash_pairs": f"""
        WITH t AS (
            SELECT doc_id,
                   list_distinct(list_transform({_SHINGLES},
                       s -> ('0x' || substring(md5(s), 1, 15))::BIGINT)) AS fh
            FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
        ),
        f AS (SELECT doc_id, unnest(fh) AS hv FROM t),
        n AS (SELECT doc_id, COUNT(*) AS nf FROM f GROUP BY 1),
        votes AS (
            SELECT doc_id, b, SUM(CASE WHEN ((hv >> b) & 1) = 1 THEN 1 ELSE 0 END) AS ones
            FROM f CROSS JOIN range(60) r(b) GROUP BY 1, 2
        ),
        sig AS (
            SELECT v.doc_id,
                   CAST(SUM(CASE WHEN 2 * ones > nf
                                 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS sim
            FROM votes v JOIN n USING (doc_id) GROUP BY 1
        ),
        sig_all AS (
            SELECT t.doc_id, COALESCE(s.sim, 0) AS sim
            FROM t LEFT JOIN sig s USING (doc_id)
        ),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
            FROM sig_all a JOIN sig_all b ON a.doc_id < b.doc_id
            WHERE ((a.sim >> 0) & 32767) = ((b.sim >> 0) & 32767)
               OR ((a.sim >> 15) & 32767) = ((b.sim >> 15) & 32767)
               OR ((a.sim >> 30) & 32767) = ((b.sim >> 30) & 32767)
               OR ((a.sim >> 45) & 32767) = ((b.sim >> 45) & 32767)
        )
        SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 8
        ORDER BY doc_a, doc_b
    """,
    "ext_tfidf_top_terms": f"""
        WITH occ AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
        dt AS (SELECT doc_id, term, COUNT(*) AS tf FROM occ GROUP BY 1, 2),
        dfreq AS (SELECT term, COUNT(*) AS df FROM dt GROUP BY 1),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT doc_id, term, tf, df,
                   tf * CAST(round((ln(CAST(n_docs + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE))
                                    + CAST(1.0 AS DOUBLE)) * CAST(1000000.0 AS DOUBLE), 0)
                             AS BIGINT) AS score_micro
            FROM dt JOIN dfreq USING (term), n
        )
        SELECT doc_id, term, tf, df, score_micro, CAST(rank_i64 AS INTEGER) AS rank FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY score_micro DESC, term ASC) AS rank_i64
            FROM scored)
        WHERE rank_i64 <= 3
        ORDER BY doc_id, rank
    """,
    "ext_bm25_search": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        dl AS (SELECT doc_id, len(toks) AS dl FROM t),
        stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
        occ AS (SELECT doc_id, unnest(toks) AS term FROM t),
        dt AS (SELECT doc_id, term, COUNT(*) AS tf FROM occ
               WHERE term IN ({_BM25_TERMS}) GROUP BY 1, 2),
        dfreq AS (SELECT term, COUNT(*) AS df FROM dt GROUP BY 1),
        contrib AS (
            SELECT dt.doc_id,
                   CAST(round(CAST(1000000.0 AS DOUBLE)
                        * ln(CAST(1.0 AS DOUBLE)
                             + (n_docs - df + CAST(0.5 AS DOUBLE))
                               / (df + CAST(0.5 AS DOUBLE)))
                        * (tf * CAST(2.2 AS DOUBLE))
                        / (tf + CAST(1.2 AS DOUBLE)
                           * (CAST(0.25 AS DOUBLE)
                              + CAST(0.75 AS DOUBLE)
                                * (dl / (CAST(sum_dl AS DOUBLE) / n_docs)))), 0)
                        AS BIGINT) AS c
            FROM dt JOIN dfreq USING (term) JOIN dl USING (doc_id), stats
        ),
        scored AS (SELECT doc_id, COUNT(*) AS n_terms, CAST(SUM(c) AS BIGINT) AS score_micro
                   FROM contrib GROUP BY doc_id)
        SELECT doc_id, n_terms, score_micro, rank FROM (
            SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id ASC) AS INTEGER) AS rank
            FROM scored)
        WHERE rank <= 10
        ORDER BY rank
    """,
    "ext_fuzzy_name_pairs": """
        SELECT a.c_custkey AS rec_a, b.c_custkey AS rec_b,
               CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
        FROM customer a JOIN customer b
          ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 2
        ORDER BY rec_a, rec_b
    """,
    "ext_source_kl_divergence": f"""
        WITH occ AS (SELECT source, unnest({_TOKS}) AS term FROM documents),
        st AS (SELECT source, term, COUNT(*) AS c_st FROM occ GROUP BY 1, 2),
        s_tot AS (SELECT source, SUM(c_st) AS total_s FROM st GROUP BY 1),
        t_tot AS (SELECT term, SUM(c_st) AS c_t FROM st GROUP BY 1),
        tot AS (SELECT SUM(c_t) AS total FROM t_tot),
        terms AS (
            SELECT source,
                   CAST(round(CAST(1000000.0 AS DOUBLE)
                        * (CAST(c_st AS DOUBLE) / total_s)
                        * ln((CAST(c_st AS DOUBLE) / total_s)
                             / (CAST(c_t AS DOUBLE) / total)), 0) AS BIGINT) AS tm
            FROM st JOIN s_tot USING (source) JOIN t_tot USING (term), tot
        )
        SELECT source, CAST(total_s AS BIGINT) AS n_tokens, CAST(SUM(tm) AS BIGINT) AS kl_micro
        FROM terms JOIN s_tot USING (source)
        GROUP BY source, total_s
        ORDER BY source
    """,
    "ext_countmin_tokens": f"""
        WITH occ AS (SELECT unnest({_TOKS}) AS term FROM documents),
        sketch AS (
            SELECT i AS row,
                   (('0x' || substring(md5(term), CAST(i * 8 + 1 AS INT), 8))::BIGINT) % 64 AS bucket,
                   COUNT(*) AS cnt
            FROM occ CROSS JOIN range(4) t(i)
            GROUP BY 1, 2
        ),
        exact AS (SELECT term, COUNT(*) AS exact_cnt FROM occ GROUP BY 1),
        probes AS (SELECT term, exact_cnt FROM exact
                   ORDER BY exact_cnt DESC, term LIMIT 20),
        pi AS (SELECT p.term, p.exact_cnt, i,
                      (('0x' || substring(md5(p.term), CAST(i * 8 + 1 AS INT), 8))::BIGINT) % 64 AS bucket
               FROM probes p CROSS JOIN range(4) t(i)),
        est AS (
            SELECT pi.term, MIN(coalesce(s.cnt, 0)) AS cm_est
            FROM pi LEFT JOIN sketch s ON s.row = pi.i AND s.bucket = pi.bucket
            GROUP BY 1
        )
        SELECT term, exact_cnt, cm_est FROM probes JOIN est USING (term)
        ORDER BY exact_cnt DESC, term
    """,
    "ext_incremental_neardup": f"""
        WITH t AS (
            SELECT doc_id, {_SHINGLES} AS sh
            FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
        ),
        pairs AS (
            SELECT q.doc_id AS new_doc, b.doc_id AS dup_of,
                   ROUND(len(list_intersect(q.sh, b.sh)) * 1.0 /
                         greatest(len(q.sh) + len(b.sh) - len(list_intersect(q.sh, b.sh)), 1), 6)
                       AS jaccard
            FROM t q JOIN t b
              ON q.doc_id % {BATCH_MOD} = {BATCH_MOD - 1}
             AND b.doc_id % {BATCH_MOD} <> {BATCH_MOD - 1}
        )
        SELECT new_doc, dup_of, jaccard FROM pairs WHERE jaccard >= {JACCARD_T}
        ORDER BY new_doc, dup_of
    """,
    "ext_text_features": f"""
        WITH base AS (
            SELECT doc_id, text, {_TOKS} AS toks, {_HITS} FROM documents
        )
        SELECT doc_id,
               CAST(len(toks) AS INTEGER) AS token_count,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)) AS INTEGER) AS bpe_token_count,
               {_LANG_CASE} AS lang_pred,
               ROUND(0.4 * least(len(toks) / 100.0, 1.0)
                   + 0.4 * (len(list_filter(toks, t -> list_contains({_STOP['en']}, t))) * 1.0
                            / greatest(len(toks), 1))
                   + 0.2 * (1.0 - (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g'))) * 1.0
                            / greatest(length(text), 1)), 4) AS quality,
               coalesce(
                   list_min(list_transform({_SHINGLES}, s -> md5(s))),
                   md5(array_to_string(toks, ' '))) AS fingerprint
        FROM base
    """,
    "ext_lang_distribution": f"""
        SELECT {_LANG_CASE} AS lang_pred, COUNT(*) AS n_docs
        FROM (SELECT text, {_HITS} FROM documents)
        GROUP BY 1 ORDER BY 1
    """,
    "ext_profile_documents": """
        WITH p AS (
            SELECT 'doc_id' AS col_name, COUNT(*) AS n_rows,
                   CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
                   COUNT(DISTINCT doc_id) AS n_distinct,
                   CAST(MIN(doc_id) AS VARCHAR) AS min_value,
                   CAST(MAX(doc_id) AS VARCHAR) AS max_value
            FROM documents
            UNION ALL
            SELECT 'text', COUNT(*),
                   CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   COUNT(DISTINCT text),
                   CAST(MIN(text) AS VARCHAR), CAST(MAX(text) AS VARCHAR)
            FROM documents
            UNION ALL
            SELECT 'lang', COUNT(*),
                   CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   COUNT(DISTINCT lang),
                   CAST(MIN(lang) AS VARCHAR), CAST(MAX(lang) AS VARCHAR)
            FROM documents
            UNION ALL
            SELECT 'source', COUNT(*),
                   CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   COUNT(DISTINCT source),
                   CAST(MIN(source) AS VARCHAR), CAST(MAX(source) AS VARCHAR)
            FROM documents
            UNION ALL
            SELECT 'n_chars', COUNT(*),
                   CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   COUNT(DISTINCT n_chars),
                   CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
            FROM documents
        )
        SELECT * FROM p ORDER BY col_name
    """,
    "ext_unigram_logprob_quality": f"""
        WITH occ AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
        dt AS (SELECT doc_id, tok, COUNT(*) AS dc FROM occ GROUP BY doc_id, tok),
        vocab AS (SELECT tok, SUM(dc) AS c FROM dt GROUP BY tok),
        total AS (SELECT SUM(c) AS total FROM vocab),
        lp AS (SELECT tok, c,
                      CAST(round(ln(c / total) * 1000000.0, 0) AS BIGINT)
                          AS lp_micro
               FROM vocab, total),
        doc AS (
            SELECT doc_id, CAST(SUM(dc) AS BIGINT) AS n_tokens,
                   CAST(SUM(dc * lp_micro) AS BIGINT) AS sum_logprob_micro,
                   SUM(CASE WHEN c <= 2 THEN dc ELSE 0 END) AS n_rare
            FROM dt JOIN lp USING (tok) GROUP BY doc_id
        )
        SELECT doc_id, n_tokens, sum_logprob_micro,
               CAST(floor(sum_logprob_micro / n_tokens) AS BIGINT)
                   AS avg_logprob_micro,
               CAST(floor(10000 * n_rare / n_tokens) AS BIGINT)
                   AS rare_frac_bp
        FROM doc ORDER BY doc_id
    """,
    "ext_dedup_exact_groups": """
        SELECT md5(text) AS text_hash, COUNT(*) AS n_docs, MIN(doc_id) AS keep_id,
               list_sort(list(doc_id)) AS doc_ids
        FROM documents GROUP BY 1 ORDER BY 1
    """,
    "ext_dedup_exact_survivors": """
        SELECT (SELECT COUNT(*) FROM documents) AS n_before,
               (SELECT COUNT(DISTINCT md5(text)) FROM documents) AS n_after
    """,
    "ext_ngram_jaccard_pairs": _JACCARD_BASE.format(brute_max=BRUTE_MAX_DOC),
    # minhash runs over the FULL corpus; LSH verified == brute force on
    # this data (recall test) so the exact-Jaccard pair set is its oracle
    "ext_minhash_lsh_pairs": _JACCARD_BASE.format(brute_max=2**62),
    "ext_embedding_neardup_pairs": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
                   WHERE vec_id < {BRUTE_MAX_DOC})
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= {NEARDUP_COS}
        ORDER BY vec_a, vec_b
    """,
    "ext_cosine_topk": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROUND(list_cosine_similarity(q.v, c.v), 6) AS cos_sim
            FROM e q JOIN e c ON q.vec_id <> c.vec_id
            WHERE q.vec_id < {TOPK_QUERY_IDS}
        )
        SELECT query_id, neighbor_id, cos_sim,
               CAST(rank_i64 AS INTEGER) AS rank FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cos_sim DESC, neighbor_id ASC) AS rank_i64
            FROM scored
        ) WHERE rank_i64 <= 10
        ORDER BY query_id, rank
    """,
}
