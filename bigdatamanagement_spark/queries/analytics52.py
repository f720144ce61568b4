"""Pretraining-hygiene pack (T70): the corpus-diagnostics a training
pipeline runs before committing to a mixture — a multinomial Naive
Bayes language classifier trained and resubstitution-scored entirely
in SQL (confusion matrix as the readout), tokenizer fertility
(chars per BPE-ish token) per language and source, and cross-source
fingerprint leakage built on the T68 winnowing fingerprints.

All three are cross-engine oracles: NB scores are exact micro-nat
integers (each log term rounded once — the t66 discipline), fertility
is integer ratios over the established portable BPE token regex, and
leakage reuses the T68 lead/frame-min fingerprint SQL verbatim.

Scale notes (100 TB):
- NB training is two keyed aggregates (class priors, (lang, tok)
  counts); the likelihood table is |langs| x |vocab| — a broadcast.
  Scoring replicates each token occurrence |langs| times (bounded
  constant fan-out), sums per (doc, lang), and takes the per-doc
  argmax on a doc-keyed window — ONE doc-keyed exchange; never a
  per-class pass over the corpus.
- fertility is a single grouped aggregate with map-side partials.
- leakage projects the fingerprint table to DISTINCT (fp, source)
  before the fp-keyed self-join, so fan-out per fingerprint is
  bounded by its distinct-source set (<= |sources|), not its document
  frequency — the analytics34 dup-matrix discipline.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.operators.text import tokens


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("documents",), register=False)[
        "documents"
    ]


def _nb_predictions(train: DataFrame, test: DataFrame) -> DataFrame:
    """(doc_id, lang, pred_lang) for every test doc under the
    train-fitted add-1 multinomial NB. OOV test tokens are skipped
    (standard NB deployment semantics); a test doc with zero known
    tokens still gets the prior-only argmax, so predictions are total.
    Argmax tiebreak: lexicographically smallest predicted language."""
    occ = train.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tok")
    )
    te_occ = test.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    d = train
    priors = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    n_total = d.agg(F.count(F.lit(1)).alias("n"))
    counts = occ.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c"))
    t_l = counts.groupBy("lang").agg(F.sum("c").alias("t_l"))
    vocab = occ.agg(F.count_distinct("tok").alias("v"))

    log_prior = (
        priors.join(F.broadcast(n_total))
        .select(
            F.col("lang").alias("cls"),
            F.round(
                F.lit(1000000.0)
                * F.log(F.col("n_l").cast("double") / F.col("n").cast("double")),
                0,
            )
            .cast("long")
            .alias("lp_prior"),
        )
    )
    # likelihood for every (cls, tok) on the observed vocabulary grid
    grid = vocab.join(F.broadcast(priors.select(F.col("lang").alias("cls")))).join(
        occ.select("tok").distinct()
    )
    lik = (
        grid.join(
            counts.select(F.col("lang").alias("cls"), "tok", "c"),
            ["cls", "tok"],
            "left",
        )
        .join(F.broadcast(t_l.select(F.col("lang").alias("cls"), "t_l")), "cls")
        .select(
            "cls",
            "tok",
            F.round(
                F.lit(1000000.0)
                * F.log(
                    (F.coalesce("c", F.lit(0)) + 1).cast("double")
                    / (F.col("t_l") + F.col("v")).cast("double")
                ),
                0,
            )
            .cast("long")
            .alias("lp_tok"),
        )
    )
    tok_sums = (
        te_occ.join(F.broadcast(lik), "tok")
        .groupBy("doc_id", "cls")
        .agg(F.sum("lp_tok").alias("s"))
    )
    base = test.select("doc_id", "lang").join(F.broadcast(log_prior))
    scored = base.join(tok_sums, ["doc_id", "cls"], "left").select(
        "doc_id",
        "lang",
        "cls",
        (F.coalesce("s", F.lit(0)) + F.col("lp_prior")).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "cls")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "lang", F.col("cls").alias("pred_lang"))
    )


def nb_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T70a — multinomial NB with add-1 smoothing, trained on the
    labeled corpus and resubstitution-scored (the standard sanity
    readout; t70d holds out a fold): confusion matrix
    (lang, pred_lang, n_docs), ordered."""
    d = _docs(spark, sf_dir)
    return (
        _nb_predictions(d, d)
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )


HOLDOUT_MOD = 5


def nb_holdout_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T70d — the proper evaluation: train on the docs with
    doc_id % 5 != 0, score the held-out fold (doc_id % 5 = 0);
    confusion matrix over the held-out docs only. OOV tokens in the
    test fold are skipped; prior-only fallback keeps predictions
    total."""
    d = _docs(spark, sf_dir)
    train = d.where(F.col("doc_id") % HOLDOUT_MOD != 0)
    test = d.where(F.col("doc_id") % HOLDOUT_MOD == 0)
    return (
        _nb_predictions(train, test)
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )


def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T70b — per (lang, source): docs, whitespace tokens, BPE-ish
    tokens, and chars per 100 BPE tokens (integer centi-ratio) — the
    fertility readout that decides whether a tokenizer is efficient on
    a corpus slice."""
    d = _docs(spark, sf_dir)
    per = d.select(
        "lang",
        "source",
        "n_chars",
        F.size(tokens(F.col("text"))).cast("long").alias("ws_toks"),
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), 0
            )
        )
        .cast("long")
        .alias("bpe_toks"),
    )
    return (
        per.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("ws_toks").cast("long").alias("ws_tokens"),
            F.sum("bpe_toks").cast("long").alias("bpe_tokens"),
            F.expr("SUM(n_chars) * 100 DIV SUM(bpe_toks)")
            .cast("long")
            .alias("chars_per_100_bpe"),
        )
        .orderBy("lang", "source")
    )


def cross_source_fp_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T70c — for every source pair (a < b): the number of DISTINCT
    winnowed fingerprints present in both — the contamination screen a
    pipeline runs between, e.g., a train crawl and a benchmark dump.
    Fan-out per fingerprint is bounded by its distinct-source set."""
    from bigdatamanagement_spark.queries.analytics50 import _fps

    d = _docs(spark, sf_dir)
    fp_src = (
        _fps(spark, sf_dir)
        .join(d.select("doc_id", "source"), "doc_id")
        .select("fp", "source")
        .distinct()
    )
    a = fp_src.alias("a")
    b = fp_src.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
        .orderBy(F.desc("shared_fps"), "source_a", "source_b")
    )


QUERIES = {
    "t70_nb_lang_confusion": nb_lang_confusion,
    "t70_tokenizer_fertility": tokenizer_fertility,
    "t70_cross_source_fp_leakage": cross_source_fp_leakage,
    "t70_nb_holdout_confusion": nb_holdout_confusion,
}

# T68's fingerprint CTEs, reused verbatim so leakage is checked against
# the identical fingerprint definition.
from bigdatamanagement_spark.queries.analytics50 import _FP_CTES  # noqa: E402

ORACLE = {
    "t70_nb_lang_confusion": """
        WITH occ AS (
            SELECT doc_id, lang,
                   unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
            FROM documents
        ),
        priors AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY 1),
        tot AS (SELECT count(*) AS n FROM documents),
        counts AS (SELECT lang, tok, count(*) AS c FROM occ GROUP BY 1, 2),
        t_l AS (SELECT lang, CAST(sum(c) AS BIGINT) AS t_l FROM counts GROUP BY 1),
        vocab AS (SELECT count(DISTINCT tok) AS v FROM occ),
        log_prior AS (
            SELECT lang AS cls,
                   CAST(round(1000000.0 * ln(n_l / (SELECT n FROM tot)::DOUBLE),
                              0) AS BIGINT) AS lp_prior
            FROM priors
        ),
        grid AS (
            SELECT p.lang AS cls, t.tok
            FROM priors p CROSS JOIN (SELECT DISTINCT tok FROM occ) t
        ),
        lik AS (
            SELECT g.cls, g.tok,
                   CAST(round(1000000.0 * ln((coalesce(c.c, 0) + 1)
                        / (t_l.t_l + (SELECT v FROM vocab))::DOUBLE), 0)
                        AS BIGINT) AS lp_tok
            FROM grid g
            LEFT JOIN counts c ON c.lang = g.cls AND c.tok = g.tok
            JOIN t_l ON t_l.lang = g.cls
        ),
        scored AS (
            SELECT o.doc_id, o.lang, l.cls,
                   CAST(sum(l.lp_tok) AS BIGINT)
                       + any_value(p.lp_prior) AS score
            FROM occ o
            JOIN lik l USING (tok)
            JOIN log_prior p ON p.cls = l.cls
            GROUP BY o.doc_id, o.lang, l.cls
        ),
        pred AS (
            SELECT doc_id, lang, cls AS pred_lang,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, cls) AS rn
            FROM scored
        )
        SELECT lang, pred_lang, count(*) AS n_docs
        FROM pred WHERE rn = 1
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "t70_tokenizer_fertility": """
        SELECT lang, source,
               count(*) AS n_docs,
               CAST(sum(len(regexp_split_to_array(lower(trim(text)), '\\s+')))
                    AS BIGINT) AS ws_tokens,
               CAST(sum(len(regexp_extract_all(text,
                    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0))) AS BIGINT)
                   AS bpe_tokens,
               CAST(sum(n_chars) * 100
                    // sum(len(regexp_extract_all(text,
                         '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)))
                    AS BIGINT) AS chars_per_100_bpe
        FROM documents
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "t70_nb_holdout_confusion": f"""
        WITH train AS (
            SELECT * FROM documents WHERE doc_id % {HOLDOUT_MOD} != 0
        ),
        test AS (
            SELECT * FROM documents WHERE doc_id % {HOLDOUT_MOD} = 0
        ),
        occ AS (
            SELECT doc_id, lang,
                   unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
            FROM train
        ),
        te_occ AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
            FROM test
        ),
        priors AS (SELECT lang, count(*) AS n_l FROM train GROUP BY 1),
        tot AS (SELECT count(*) AS n FROM train),
        counts AS (SELECT lang, tok, count(*) AS c FROM occ GROUP BY 1, 2),
        t_l AS (SELECT lang, CAST(sum(c) AS BIGINT) AS t_l FROM counts GROUP BY 1),
        vocab AS (SELECT count(DISTINCT tok) AS v FROM occ),
        log_prior AS (
            SELECT lang AS cls,
                   CAST(round(1000000.0 * ln(n_l / (SELECT n FROM tot)::DOUBLE),
                              0) AS BIGINT) AS lp_prior
            FROM priors
        ),
        grid AS (
            SELECT p.lang AS cls, t.tok
            FROM priors p CROSS JOIN (SELECT DISTINCT tok FROM occ) t
        ),
        lik AS (
            SELECT g.cls, g.tok,
                   CAST(round(1000000.0 * ln((coalesce(c.c, 0) + 1)
                        / (t_l.t_l + (SELECT v FROM vocab))::DOUBLE), 0)
                        AS BIGINT) AS lp_tok
            FROM grid g
            LEFT JOIN counts c ON c.lang = g.cls AND c.tok = g.tok
            JOIN t_l ON t_l.lang = g.cls
        ),
        tok_sums AS (
            SELECT o.doc_id, l.cls, CAST(sum(l.lp_tok) AS BIGINT) AS s
            FROM te_occ o JOIN lik l USING (tok)
            GROUP BY 1, 2
        ),
        scored AS (
            SELECT t.doc_id, t.lang, p.cls,
                   coalesce(ts.s, 0) + p.lp_prior AS score
            FROM test t
            CROSS JOIN log_prior p
            LEFT JOIN tok_sums ts ON ts.doc_id = t.doc_id AND ts.cls = p.cls
        ),
        pred AS (
            SELECT doc_id, lang, cls AS pred_lang,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, cls) AS rn
            FROM scored
        )
        SELECT lang, pred_lang, count(*) AS n_docs
        FROM pred WHERE rn = 1
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "t70_cross_source_fp_leakage": f"""
        WITH {_FP_CTES},
        fp_src AS (
            SELECT DISTINCT f.fp, d.source
            FROM fps f JOIN documents d USING (doc_id)
        )
        SELECT a.source AS source_a, b.source AS source_b,
               count(*) AS shared_fps
        FROM fp_src a JOIN fp_src b
          ON a.fp = b.fp AND a.source < b.source
        GROUP BY 1, 2
        ORDER BY shared_fps DESC, source_a, source_b
    """,
}
