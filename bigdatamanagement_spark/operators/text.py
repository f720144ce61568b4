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
