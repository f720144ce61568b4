"""Text analysis operators for training-data pipelines (extension surface;
SURVEY §7 step 8): language-ID, quality scoring, token counting, document
fingerprinting.

Everything here is built from JVM-side expressions (split / higher-order
array functions / regexp) — no Python UDFs — so the operators stay inside
whole-stage codegen and scale linearly with executors. Each has an exact
DuckDB-SQL mirror in queries/extensions.py, putting the extension surface
under the same oracle contract as the core packs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Small public stopword lists; fixed priority order is the deterministic
# tie-break for language-ID (first in list wins on equal hit counts).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "von"],
    "es": ["el", "los", "y", "que", "un", "por", "con", "una", "se", "como"],
    "fr": ["le", "les", "et", "dans", "pour", "sur", "au", "ce", "il", "pas"],
}

TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"  # BPE-ish pieces


def tokens(text: Column) -> Column:
    """Whitespace tokens, lowercased."""
    return F.split(F.lower(F.trim(text)), "\\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_token_count(text: Column) -> Column:
    """BPE-ish piece count: letter runs, digit runs, single punctuation."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0))


def lang_id(text: Column) -> Column:
    """n-gram-free heuristic language ID: argmax of stopword hits over the
    distinct token set, ties broken by LANG_STOPWORDS declaration order."""
    return lang_id_from_tokens(tokens(text))


def lang_id_from_tokens(toks_col: Column) -> Column:
    toks = F.array_distinct(toks_col)
    result = F.lit(None).cast("string")
    best = F.lit(-1)
    # Build a right-fold: later (lower-priority) langs only win with a
    # STRICTLY greater count.
    for code, words in LANG_STOPWORDS.items():
        hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        result = F.when(hits > best, F.lit(code)).otherwise(result)
        best = F.greatest(hits, best)
    return result


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    return stopword_ratio_from_tokens(tokens(text), lang)


def stopword_ratio_from_tokens(toks: Column, lang: str = "en") -> Column:
    stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text: Column) -> Column:
    """Fraction of non-alphanumeric, non-whitespace characters."""
    stripped = F.regexp_replace(text, "[^A-Za-z0-9\\s]", "")
    return (F.length(text) - F.length(stripped)) / F.greatest(F.length(text), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite quality score in [0,1]: length saturation + stopword
    density + punctuation cleanliness. Heuristic mirror of the filters a
    pretraining pipeline applies before tokenization."""
    length_part = F.least(token_count(text) / F.lit(100.0), F.lit(1.0))
    return F.round(
        0.4 * length_part + 0.4 * stopword_ratio(text) + 0.2 * (1.0 - punct_ratio(text)),
        4,
    )


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles (the dedup/fingerprint unit)."""
    return shingles_from_tokens(tokens(text), k)


def raw_shingles_from_tokens(toks: Column, k: int = 2) -> Column:
    """Sliding k-gram strings WITH duplicates, in document order — the
    unit for repetition metrics (duplicate-gram fraction, top-gram
    fraction), where multiplicity is the signal that
    ``shingles_from_tokens``'s array_distinct would destroy. Same
    zip_with shifted-copy construction (linear; see below)."""
    n = F.size(toks)
    acc = toks
    for j in range(1, k):
        shifted = F.slice(toks, j + 1, F.greatest(n - j, F.lit(0)))
        acc = F.zip_with(acc, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    acc = F.coalesce(acc, F.array().cast("array<string>"))
    return F.filter(acc, lambda s: s.isNotNull())


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    # Sliding window via a zip_with chain over k shifted copies of the
    # token array, NOT element_at(toks, i+j) inside a transform lambda:
    # expressions inside a higher-order lambda that reference the outer
    # array are re-evaluated PER ELEMENT, so the element_at construction
    # re-ran the upstream tokenizer O(n_tokens) times per row whenever
    # `toks` was an unmaterialized expression (measured ~8 s/1k docs).
    # Here `toks` is referenced exactly k+1 times at row level — linear.
    # zip_with pads the shorter (shifted) side with null and concat
    # propagates null, so the k-1 invalid tail windows filter out.
    return F.array_distinct(raw_shingles_from_tokens(toks, k))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: lexicographic-min MD5 over 3-word shingles of
    the normalized text (a 1-hash winnowing); falls back to MD5 of the
    whole normalized text for docs shorter than one shingle."""
    return fingerprint_from_tokens(tokens(text))


def fingerprint_from_tokens(toks: Column) -> Column:
    sh = shingles_from_tokens(toks, 3)
    norm = F.concat_ws(" ", toks)
    min_md5 = F.array_min(F.transform(sh, lambda s: F.md5(s)))
    return F.coalesce(min_md5, F.md5(norm))


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach all text-analysis columns.

    Tokenizes ONCE behind a repartition barrier and derives every feature
    from the materialized token array — without the barrier each feature
    column would re-split the text (CollapseProject inlining)."""
    t = F.col(text_col)
    toks = F.col("__toks")
    staged = df.withColumn("__toks", tokens(t)).repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
    length_part = F.least(F.size(toks) / F.lit(100.0), F.lit(1.0))
    quality = F.round(
        0.4 * length_part
        + 0.4 * stopword_ratio_from_tokens(toks)
        + 0.2 * (1.0 - punct_ratio(t)),
        4,
    )
    return (
        staged.withColumn("token_count", F.size(toks))
        .withColumn("bpe_token_count", bpe_token_count(t))
        .withColumn("lang_pred", lang_id_from_tokens(toks))
        .withColumn("quality", quality)
        .withColumn("fingerprint", fingerprint_from_tokens(toks))
        .drop("__toks")
    )


def unigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_count_max: int = 2,
) -> DataFrame:
    """Corpus-level unigram language-model quality score per document —
    the classic perplexity-proxy filter (CCNet / Wenzek et al. 2020 use a
    5-gram KenLM; the unigram degeneration is the piece expressible as
    pure relational algebra): train p(t) = count(t)/total over the WHOLE
    corpus, then score each doc by its mean token log-probability. Low
    (very negative) scores = mostly-rare-token noise; near-zero scores =
    degenerate high-frequency repetition.

    Returns (id, n_tokens, sum_logprob_micro, avg_logprob_micro,
    rare_frac_bp): log-probs are per-token rounded to integer MICRO-nats
    and summed as BIGINT, so aggregation order cannot drift the result
    between engines (double summation is order-sensitive; integer
    summation is not). ``rare_frac_bp`` = basis points of token
    occurrences whose corpus count <= ``rare_count_max``.

    Plan shape (scale-first): one corpus scan explodes tokens once; a
    (doc, token) partial count collapses each doc's repeated tokens
    BEFORE the corpus-wide vocab aggregate, so the token-keyed shuffle
    moves per-doc vocab rows, not raw occurrences (the heavy-hitter
    "the" rows collapse per doc map-side). The trained vocab (≪ corpus;
    ~1e6-1e8 rows even at 100 TB) broadcasts back onto the (doc, token)
    stream — no shuffle on the skewed token key — and the final
    aggregate is doc-keyed. If the vocab ever outgrew broadcast range,
    the join falls back to a shuffle join where AQE's skew split handles
    the head of the Zipf curve.
    """
    occ = df.select(
        F.col(id_col).alias("__id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    doc_tok = occ.groupBy("__id", "tok").agg(F.count("*").alias("dc"))
    vocab = doc_tok.groupBy("tok").agg(F.sum("dc").alias("c"))
    total = vocab.agg(F.sum("c").alias("total"))
    lp = vocab.crossJoin(F.broadcast(total)).select(
        "tok",
        "c",
        F.round(F.log(F.col("c") / F.col("total")) * 1000000.0, 0)
        .cast("bigint")
        .alias("lp_micro"),
    )
    return (
        doc_tok.join(F.broadcast(lp), "tok")
        .groupBy("__id")
        .agg(
            F.sum("dc").alias("n_tokens"),
            F.sum(F.col("dc") * F.col("lp_micro")).alias("sum_logprob_micro"),
            F.sum(
                F.when(F.col("c") <= rare_count_max, F.col("dc")).otherwise(F.lit(0))
            ).alias("n_rare"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_tokens",
            "sum_logprob_micro",
            F.floor(F.col("sum_logprob_micro") / F.col("n_tokens"))
            .cast("bigint")
            .alias("avg_logprob_micro"),
            F.floor(F.lit(10000) * F.col("n_rare") / F.col("n_tokens"))
            .cast("bigint")
            .alias("rare_frac_bp"),
        )
    )


def repetition_metrics(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dup_k: int = 3,
) -> DataFrame:
    """Gopher-style repetition metrics per document (Rae et al. 2021,
    "Scaling Language Models", §A1.1 repetition filters — public paper):
    (id, n_tokens, top_token_frac, top_bigram_frac, dup_kgram_frac).

    - top_token_frac  = occurrences of the most frequent token / n_tokens
    - top_bigram_frac = occurrences of the most frequent bigram / n_bigrams
    - dup_kgram_frac  = fraction of k-gram OCCURRENCES beyond first use
                        (1 - distinct/total), k = ``dup_k``

    Plan shape (scale-first): ONE corpus scan builds unigram+bigram+k-gram
    structs in a single projection and explodes once; one (id, k, gram)
    count aggregate; one (id, k) roll-up pivoted to columns. Both shuffles
    are keyed by doc id, so at 100 TB this is two well-partitioned
    aggregations of the exploded gram stream — no window functions, no
    per-row Python. Fractions are small-integer divisions → bit-identical
    across engines.
    """
    toks = tokens(F.col(text_col))
    gram_struct = lambda arr, k: F.transform(  # noqa: E731
        arr, lambda g: F.struct(F.lit(k).alias("k"), g.alias("gram"))
    )
    # n_tokens is NOT carried through the explode: any per-doc column
    # computed from text in the exploding projection is re-evaluated per
    # exploded gram row (Project sits above Generate — the text would be
    # re-tokenized |grams| times per doc, measured 5x slower). It equals
    # the unigram occurrence total, so it's recovered from the aggregate.
    grams = df.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.concat(
                gram_struct(toks, 1),
                gram_struct(raw_shingles_from_tokens(toks, 2), 2),
                gram_struct(raw_shingles_from_tokens(toks, dup_k), dup_k),
            )
        ).alias("g"),
    )
    cnt = grams.groupBy(
        "__id", F.col("g.k").alias("k"), F.col("g.gram").alias("gram")
    ).agg(F.count("*").alias("c"))
    per_k = cnt.groupBy("__id", "k").agg(
        F.max("c").alias("max_c"),
        F.sum("c").alias("tot"),
        F.count("*").alias("n_distinct"),
    )
    pick = lambda k, expr: F.max(F.when(F.col("k") == k, expr))  # noqa: E731
    return (
        per_k.groupBy("__id")
        .agg(
            pick(1, F.col("tot")).alias("n_tokens"),
            F.round(pick(1, F.col("max_c") / F.col("tot")), 4).alias("top_token_frac"),
            F.round(
                F.coalesce(pick(2, F.col("max_c") / F.col("tot")), F.lit(0.0)), 4
            ).alias("top_bigram_frac"),
            F.round(
                F.coalesce(
                    pick(dup_k, (F.col("tot") - F.col("n_distinct")) / F.col("tot")),
                    F.lit(0.0),
                ),
                4,
            ).alias(f"dup_{dup_k}gram_frac"),
        )
        .withColumnRenamed("__id", id_col)
    )
