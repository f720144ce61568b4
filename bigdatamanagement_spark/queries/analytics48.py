"""Perplexity-tier curation pack (T66): the CCNet head/middle/tail
split at DOCUMENT grain — each document scores under the corpus-trained
add-1 bigram LM (per-occurrence micro-nat NLL, exact integer sums), the
corpus ranks by per-token NLL through the two-phase distributed global
rank, and documents bucket into thirds (tier 1 = head/lowest
perplexity). The per-(source, tier) report is the table a CCNet-style
pipeline keys its keep/drop policy on.

Reference anchors (SURVEY §2): the doc-grain upgrade of
ext_bigram_perplexity_by_source (analytics2) — same LM, same micro-nat
discipline, new grain + the rank/tier layer.

Scale notes (100 TB):
- bigram counts are one pair-keyed aggregate; occurrences re-join on
  the same key; V broadcasts (the analytics2 shape, unchanged).
- the doc ranking is rank.global_row_number (range repartition +
  broadcast offsets) — never a bare Window.orderBy over doc grain;
  tiers come from the quantile_bucket formula (back-loaded remainder,
  one integer expression identical on both engines).
- ties: per-token NLL ties break on doc_id, so the tier assignment is
  deterministic to the bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.operators import text as T

N_TIERS = 3


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("documents",), register=False)[
        "documents"
    ]


def perplexity_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T66 — per-(source, tier) doc counts, chars, and mean per-token
    NLL after splitting the corpus into exact rank thirds by per-token
    bigram NLL (micro-nats; docs with < 2 tokens carry NLL 0 and rank
    first). Tier 1 = head (best), 3 = tail."""
    from bigdatamanagement_spark.operators.rank import (
        global_row_number,
        quantile_bucket,
    )

    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", "source", "n_chars", T.tokens(F.col("text")).alias("toks")
    )
    occ = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.expr(
                    "transform(sequence(1, size(toks) - 1), i -> "
                    "struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))"
                ),
            ).otherwise(F.expr("array()"))
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    bc = occ.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_ab"))
    w1c = bc.groupBy("w1").agg(F.sum("c_ab").alias("c_a"))
    vocab = d.select(
        F.explode(T.tokens(F.col("text"))).alias("t")
    ).agg(F.count_distinct("t").alias("v"))
    p = (F.col("c_ab") + 1).cast("double") / (
        F.col("c_a") + F.col("v")
    ).cast("double")
    term = F.round(F.lit(-1000000.0) * F.log(p), 0).cast("long")
    per_doc = (
        occ.join(bc, ["w1", "w2"])
        .join(w1c, "w1")
        .join(F.broadcast(vocab))
        .select("doc_id", term.alias("nll"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("nll").cast("long").alias("nll_micro"),
        )
    )
    scored = (
        toks.select("doc_id", "source", "n_chars")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce(
                F.expr("nll_micro DIV n_bigrams"), F.lit(0)
            ).cast("long").alias("nll_per_tok_micro"),
        )
    )
    ranked, n = global_row_number(
        scored, [F.col("nll_per_tok_micro"), F.col("doc_id")], "rk"
    )
    tiered = ranked.withColumn(
        "tier", quantile_bucket("rk", n, N_TIERS).cast("long")
    )
    return (
        tiered.groupBy("source", "tier")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.expr("SUM(nll_per_tok_micro) DIV COUNT(*)")
            .cast("long")
            .alias("mean_nll_per_tok_micro"),
        )
        .orderBy("source", "tier")
    )


QUERIES = {"t66_perplexity_tiers": perplexity_tiers}

_TOKS = "regexp_split_to_array(lower(trim(text)), '\\s+')"

ORACLE = {
    "t66_perplexity_tiers": f"""
        WITH t AS (
            SELECT doc_id, source, n_chars, {_TOKS} AS toks FROM documents
        ),
        occ AS (
            SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
            FROM t, unnest(generate_series(1, len(toks) - 1)) AS g(i)
            WHERE len(toks) >= 2
        ),
        bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_ab
               FROM occ GROUP BY 1, 2),
        w1c AS (SELECT w1, CAST(SUM(c_ab) AS BIGINT) AS c_a FROM bc GROUP BY 1),
        vocab AS (
            SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
            FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
        ),
        per_doc AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                   CAST(SUM(CAST(round(-1000000.0 *
                       ln(CAST(c_ab + 1 AS DOUBLE) / CAST(c_a + v AS DOUBLE)),
                       0) AS BIGINT)) AS BIGINT) AS nll_micro
            FROM occ JOIN bc USING (w1, w2) JOIN w1c USING (w1)
            CROSS JOIN vocab
            GROUP BY 1
        ),
        scored AS (
            SELECT t.doc_id, t.source, t.n_chars,
                   COALESCE(p.n_bigrams, 0) AS n_bigrams,
                   CAST(COALESCE(p.nll_micro // p.n_bigrams, 0) AS BIGINT)
                       AS nll_per_tok_micro
            FROM t LEFT JOIN per_doc p USING (doc_id)
        ),
        ranked AS (
            SELECT *,
                   row_number() OVER (ORDER BY nll_per_tok_micro, doc_id)
                       AS rk,
                   COUNT(*) OVER () AS n
            FROM scored
        ),
        tiered AS (
            SELECT source, n_chars, nll_per_tok_micro,
                   CAST(1 + ((rk - 1) * {N_TIERS}) // n AS BIGINT) AS tier
            FROM ranked
        )
        SELECT source, tier,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(nll_per_tok_micro) // COUNT(*) AS BIGINT)
                   AS mean_nll_per_tok_micro
        FROM tiered
        GROUP BY source, tier
        ORDER BY source, tier
    """,
}
