"""Training-mixture planning pack (T64): the token-accounting layer a
pretraining run sits on top of — mixture allocation under per-language
target weights, epoch-repetition planning under a token budget beyond
availability (the data-constrained regime), quality-temperature sampling
weights per source, and the dedup token-yield waterfall (raw → exact →
near-dup tokens per source).

Reference anchors (SURVEY §2): extends the ext_training_set_manifest /
ext_mixture_sample family from per-document curation to CORPUS-LEVEL
planning — the numbers a data lead reads before launching a run.

Scale notes (100 TB):
- every query is one documents scan folding to a |langs|- or
  |sources|-row grid; token counts are exact BIGINT sums.
- mixture plan: T_max = min over langs of available·10000 DIV weight_bp
  — the binding-constraint argmin is a tiny-grid reduce.
- epoch plan: targets/epochs are integer DIV folds of exact sums; the
  budget is a literal multiple of total availability (SF-invariant).
- temperature weights: ln/exp enters ONCE through a shared expression
  string over exact micro means (the t19 entropy discipline).
- token yield: exact-dup keep = min-doc_id per md5(text); near-dup keep
  = SimHash cluster representative — the SimHash pair oracle is the
  near-linear banded mirror (extensions ext_simhash_pairs), so this
  whole waterfall stays DuckDB-checkable at sf0.1 directly (no
  quadratic oracle, unlike the MinHash cluster family).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bigdatamanagement_spark.catalog import load_testdata

# per-language target mixture in basis points (sums to 10 000); langs
# outside the table get weight 0 and drop from the plan (documented)
LANG_WEIGHTS_BP = {"en": 4000, "zh": 1500, "es": 1500, "de": 1500, "fr": 1500}
BUDGET_X = 3  # epoch-plan token budget = BUDGET_X × total availability
TEMP = 0.5  # quality-sampling temperature

_TOKCNT = "CAST(size(split(lower(trim(text)), '\\\\s+')) AS BIGINT)"
_SQL_TOKCNT = "CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT)"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("documents",), register=False)[
        "documents"
    ]


def _weight_case(col: str) -> str:
    whens = " ".join(
        f"WHEN '{lang}' THEN {bp}" for lang, bp in LANG_WEIGHTS_BP.items()
    )
    return f"(CASE {col} {whens} ELSE 0 END)"


def mixture_token_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T64a — no-repetition mixture allocation: per language, available
    whitespace tokens and the target weight (bp); the plan total is
    T_max = min over languages of available·10000 DIV weight_bp (the
    binding language pins the mixture), each language's allocation is
    T_max·w DIV 10000, and utilization_bp shows how much of each pool
    the plan consumes (the binding language reads 10000 or one floor
    below). All exact BIGINT arithmetic.

    Scale: one scan -> |langs| rows -> broadcast of the 1-row min."""
    d = _docs(spark, sf_dir)
    per = (
        d.select(F.col("lang"), F.expr(_TOKCNT).alias("tok"))
        .groupBy("lang")
        .agg(F.sum("tok").cast("long").alias("available_tokens"))
        .withColumn("weight_bp", F.expr(_weight_case("lang")).cast("long"))
        .filter(F.col("weight_bp") > 0)
    )
    tmax = per.agg(
        F.min(
            F.expr("(available_tokens * 10000) DIV weight_bp")
        ).cast("long").alias("plan_total")
    )
    return (
        per.join(F.broadcast(tmax))
        .select(
            "lang",
            "available_tokens",
            "weight_bp",
            "plan_total",
            F.expr("(plan_total * weight_bp) DIV 10000")
            .cast("long")
            .alias("allocated_tokens"),
            F.expr(
                "((plan_total * weight_bp) DIV 10000) * 10000"
                " DIV available_tokens"
            )
            .cast("long")
            .alias("utilization_bp"),
        )
        .orderBy("lang")
    )


def epoch_repetition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T64b — data-constrained epoch plan: with a token budget of
    BUDGET_X × total availability (the regime where targets exceed any
    single pool), each language's target is budget·w DIV 10000 and its
    repetition factor is target·1e6 DIV available (micro epochs; DIV 1e6
    gives full epochs, the remainder is the partial-epoch token count).
    The Muennighoff-style repeat accounting, exact end to end.

    Scale: same |langs|-row grid as T64a plus one total reduce."""
    d = _docs(spark, sf_dir)
    per = (
        d.select(F.col("lang"), F.expr(_TOKCNT).alias("tok"))
        .groupBy("lang")
        .agg(F.sum("tok").cast("long").alias("available_tokens"))
        .withColumn("weight_bp", F.expr(_weight_case("lang")).cast("long"))
        .filter(F.col("weight_bp") > 0)
    )
    tot = per.agg(
        (F.sum("available_tokens") * BUDGET_X).cast("long").alias("budget_tokens")
    )
    return (
        per.join(F.broadcast(tot))
        .select(
            "lang",
            "available_tokens",
            "weight_bp",
            "budget_tokens",
            F.expr("(budget_tokens * weight_bp) DIV 10000")
            .cast("long")
            .alias("target_tokens"),
            F.expr(
                "(((budget_tokens * weight_bp) DIV 10000) * 1000000)"
                " DIV available_tokens"
            )
            .cast("long")
            .alias("epochs_micro"),
        )
        .orderBy("lang")
    )


# exp enters once, over the exact micro mean — identical text on both
# engines (the shared-expression discipline)
_TEMP_W = (
    "CAST(floor(1000000.0 * exp((CAST(mean_q_micro AS DOUBLE) / 1000000.0)"
    f" / {TEMP})) AS BIGINT)"
)


def quality_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T64c — quality-temperature sampling weights per source: each
    source's mean quality (exact micro mean, floor DIV) maps to weight
    w = floor(1e6·exp(q/T)) and a normalized share in basis points
    (w·10000 DIV Σw) — the upsample-good-sources knob, T literal. One
    shared exp expression; everything else BIGINT.

    Scale: one scan -> |sources| rows -> broadcast 1-row total."""
    from bigdatamanagement_spark.operators.text import quality_score

    d = _docs(spark, sf_dir)
    per = (
        d.select(
            "source",
            # round-then-cast: Spark's double->long cast truncates while
            # DuckDB's rounds, so the micro quantization must round on
            # BOTH engines (the repo-wide discipline)
            F.round(quality_score(F.col("text")) * 1_000_000, 0)
            .cast("long")
            .alias("q_micro"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("q_micro").cast("long").alias("sum_q_micro"),
        )
        .withColumn("mean_q_micro", F.expr("sum_q_micro DIV n_docs"))
        .withColumn("w_micro", F.expr(_TEMP_W))
    )
    tot = per.agg(F.sum("w_micro").cast("long").alias("total_w"))
    return (
        per.join(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "mean_q_micro",
            "w_micro",
            F.expr("(w_micro * 10000) DIV total_w")
            .cast("long")
            .alias("share_bp"),
        )
        .orderBy("source")
    )


def dedup_token_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T64d — the dedup token waterfall per source: raw tokens, tokens
    kept by EXACT dedup (min-doc_id survivor per md5(text)), and tokens
    kept by NEAR-dup dedup on top (SimHash cluster representative —
    hamming ≤ 8 pairs, connected components, min-id rep). The per-stage
    token attrition every curation report leads with.

    Scale: exact stage is one md5-keyed aggregate; near stage reuses the
    banded SimHash pair GRAPH (the memoized multi-consumer ingest
    artifact shared with ext_simhash_pairs — never all-pairs) +
    star-contraction components; oracle-checkable at sf0.1 directly
    because the SimHash oracle is the near-linear banded mirror."""
    from bigdatamanagement_spark.operators import cluster as C

    d = _docs(spark, sf_dir).select(
        "doc_id", "source", "text", F.expr(_TOKCNT).alias("tok")
    ).localCheckpoint()
    raw = d.groupBy("source").agg(
        F.sum("tok").cast("long").alias("raw_tokens")
    )
    exact_keep = (
        d.withColumn("h", F.md5("text"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .join(d, "doc_id")
    )
    exact = exact_keep.groupBy("source").agg(
        F.sum("tok").cast("long").alias("exact_tokens")
    )
    from bigdatamanagement_spark.queries.extensions import _simhash_pair_graph

    pairs = _simhash_pair_graph(spark, sf_dir).select("doc_a", "doc_b")
    labels = C.assign_clusters(d, "doc_id", pairs, "doc_a", "doc_b")
    # assign_clusters preserves the doc columns (source, tok ride along)
    near = (
        labels.filter(F.col("doc_id") == F.col("cluster_rep"))
        .groupBy("source")
        .agg(F.sum("tok").cast("long").alias("near_tokens"))
    )
    return (
        raw.join(exact, "source")
        .join(near, "source")
        .orderBy("source")
    )


KNUTH = 2654435761  # Knuth multiplicative hash (the traindata idiom)


def mixture_realization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T64e — REALIZE the epoch plan as a concrete sample: each
    language contributes floor(epochs) full corpus copies plus a
    deterministic Knuth-hash partial sample at rate epochs_micro mod
    1e6 (doc kept iff (doc_id·KNUTH) mod 2^32 mod 1e6 < rate — the
    hash-rate idiom, stable under corpus growth). Reports realized vs
    target tokens and the absolute gap in basis points — the closure
    from the T64b PLAN to an actual training manifest; the gap is the
    doc-granularity quantization a token-level sampler would close.

    Scale: one doc scan for the partial sums; everything else rides
    the |langs|-row plan grid."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "lang", "doc_id", F.expr(_TOKCNT).alias("tok")
    ).localCheckpoint()
    per = (
        toks.groupBy("lang")
        .agg(F.sum("tok").cast("long").alias("available_tokens"))
        .withColumn("weight_bp", F.expr(_weight_case("lang")).cast("long"))
        .filter(F.col("weight_bp") > 0)
    )
    tot = per.agg(
        (F.sum("available_tokens") * BUDGET_X).cast("long").alias("budget_tokens")
    )
    plan = per.join(F.broadcast(tot)).select(
        "lang",
        "available_tokens",
        F.expr("(budget_tokens * weight_bp) DIV 10000")
        .cast("long")
        .alias("target_tokens"),
        F.expr(
            "(((budget_tokens * weight_bp) DIV 10000) * 1000000)"
            " DIV available_tokens"
        )
        .cast("long")
        .alias("epochs_micro"),
    )
    partial = (
        toks.join(F.broadcast(plan.select("lang", "epochs_micro")), "lang")
        .filter(
            F.expr(
                f"(doc_id * {KNUTH}) % 4294967296 % 1000000"
                " < epochs_micro % 1000000"
            )
        )
        .groupBy("lang")
        .agg(F.sum("tok").cast("long").alias("partial_tokens"))
    )
    return (
        plan.join(partial, "lang", "left")
        .select(
            "lang",
            "target_tokens",
            F.expr(
                "(epochs_micro DIV 1000000) * available_tokens"
                " + COALESCE(partial_tokens, 0)"
            )
            .cast("long")
            .alias("realized_tokens"),
            F.expr(
                "(abs((epochs_micro DIV 1000000) * available_tokens"
                " + COALESCE(partial_tokens, 0) - target_tokens) * 10000)"
                " DIV target_tokens"
            )
            .cast("long")
            .alias("gap_bp"),
        )
        .orderBy("lang")
    )


QUERIES = {
    "t64_mixture_token_plan": mixture_token_plan,
    "t64_epoch_repetition_plan": epoch_repetition_plan,
    "t64_quality_temperature_weights": quality_temperature_weights,
    "t64_dedup_token_yield": dedup_token_yield,
    "t64_mixture_realization": mixture_realization,
}

_SQL_WEIGHTS = " ".join(
    f"WHEN '{lang}' THEN {bp}" for lang, bp in LANG_WEIGHTS_BP.items()
)
_PER_LANG = f"""
    per AS (
        SELECT lang,
               CAST(SUM({_SQL_TOKCNT}) AS BIGINT) AS available_tokens,
               CAST(CASE lang {_SQL_WEIGHTS} ELSE 0 END AS BIGINT) AS weight_bp
        FROM documents GROUP BY lang
        HAVING CAST(CASE lang {_SQL_WEIGHTS} ELSE 0 END AS BIGINT) > 0
    )
"""

ORACLE = {
    "t64_mixture_token_plan": f"""
        WITH {_PER_LANG},
        tmax AS (
            SELECT CAST(MIN((available_tokens * 10000) // weight_bp)
                        AS BIGINT) AS plan_total
            FROM per
        )
        SELECT lang, available_tokens, weight_bp, plan_total,
               CAST((plan_total * weight_bp) // 10000 AS BIGINT)
                   AS allocated_tokens,
               CAST(((plan_total * weight_bp) // 10000) * 10000
                    // available_tokens AS BIGINT) AS utilization_bp
        FROM per CROSS JOIN tmax
        ORDER BY lang
    """,
    "t64_epoch_repetition_plan": f"""
        WITH {_PER_LANG},
        tot AS (
            SELECT CAST(SUM(available_tokens) * {BUDGET_X} AS BIGINT)
                   AS budget_tokens
            FROM per
        )
        SELECT lang, available_tokens, weight_bp, budget_tokens,
               CAST((budget_tokens * weight_bp) // 10000 AS BIGINT)
                   AS target_tokens,
               CAST((((budget_tokens * weight_bp) // 10000) * 1000000)
                    // available_tokens AS BIGINT) AS epochs_micro
        FROM per CROSS JOIN tot
        ORDER BY lang
    """,
}

ORACLE["t64_mixture_realization"] = f"""
    WITH toks AS (
        SELECT lang, doc_id, {_SQL_TOKCNT} AS tok FROM documents
    ),
    per AS (
        SELECT lang,
               CAST(SUM(tok) AS BIGINT) AS available_tokens,
               CAST(CASE lang {_SQL_WEIGHTS} ELSE 0 END AS BIGINT) AS weight_bp
        FROM toks GROUP BY lang
        HAVING CAST(CASE lang {_SQL_WEIGHTS} ELSE 0 END AS BIGINT) > 0
    ),
    tot AS (
        SELECT CAST(SUM(available_tokens) * {BUDGET_X} AS BIGINT)
               AS budget_tokens
        FROM per
    ),
    plan AS (
        SELECT lang, available_tokens,
               CAST((budget_tokens * weight_bp) // 10000 AS BIGINT)
                   AS target_tokens,
               CAST((((budget_tokens * weight_bp) // 10000) * 1000000)
                    // available_tokens AS BIGINT) AS epochs_micro
        FROM per CROSS JOIN tot
    ),
    part AS (
        SELECT t.lang, CAST(SUM(t.tok) AS BIGINT) AS partial_tokens
        FROM toks t JOIN plan p USING (lang)
        WHERE (t.doc_id * {KNUTH}) % 4294967296 % 1000000
              < p.epochs_micro % 1000000
        GROUP BY t.lang
    )
    SELECT p.lang, p.target_tokens,
           CAST((p.epochs_micro // 1000000) * p.available_tokens
                + COALESCE(pt.partial_tokens, 0) AS BIGINT)
               AS realized_tokens,
           CAST((abs((p.epochs_micro // 1000000) * p.available_tokens
                + COALESCE(pt.partial_tokens, 0) - p.target_tokens) * 10000)
                // p.target_tokens AS BIGINT) AS gap_bp
    FROM plan p LEFT JOIN part pt USING (lang)
    ORDER BY p.lang
"""

# t64c: the quality expression is pipeline._QUALITY_CTE's (same literal
# stopword list and term order); the exp weight is the shared _TEMP_W
# text with // for DIV
from bigdatamanagement_spark.queries.pipeline import _QUALITY_CTE as _QCTE

ORACLE["t64_quality_temperature_weights"] = f"""
    WITH {_QCTE},
    per AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CAST(round(quality * 1000000, 0) AS BIGINT))
                    AS BIGINT) AS sum_q_micro
        FROM qdocs GROUP BY source
    ),
    w AS (
        SELECT source, n_docs, sum_q_micro,
               CAST(sum_q_micro // n_docs AS BIGINT) AS mean_q_micro
        FROM per
    ),
    ww AS (
        SELECT *, {_TEMP_W} AS w_micro
        FROM (SELECT source, n_docs, mean_q_micro FROM w)
    ),
    tot AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS total_w FROM ww)
    SELECT source, n_docs, mean_q_micro, w_micro,
           CAST((w_micro * 10000) // total_w AS BIGINT) AS share_bp
    FROM ww CROSS JOIN tot
    ORDER BY source
"""

# t64d: SimHash pair CTEs sliced from the extensions oracle (the banded
# near-linear mirror), + recursive closure + the token waterfall
from bigdatamanagement_spark.queries import extensions as _E

_SIMHASH_PREFIX = _E.ORACLE["ext_simhash_pairs"]
_SIMHASH_PREFIX = _SIMHASH_PREFIX[: _SIMHASH_PREFIX.rindex("SELECT doc_a")]
_SIMHASH_PREFIX = _SIMHASH_PREFIX.replace("WITH t AS", "WITH RECURSIVE t AS", 1)

ORACLE["t64_dedup_token_yield"] = (
    _SIMHASH_PREFIX
    + f""",
    hp AS (SELECT doc_a, doc_b FROM pairs WHERE hamming <= 8),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM hp
        UNION SELECT doc_b, doc_a FROM hp
    ),
    reach(nd, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.u, reach.r FROM edges e JOIN reach ON reach.nd = e.v
    ),
    clusters AS (
        SELECT nd AS doc_id, MIN(r) AS cluster_rep FROM reach GROUP BY nd
    ),
    dtok AS (
        SELECT doc_id, source, {_SQL_TOKCNT} AS tok FROM documents
    ),
    raw AS (
        SELECT source, CAST(SUM(tok) AS BIGINT) AS raw_tokens
        FROM dtok GROUP BY source
    ),
    ek AS (
        SELECT MIN(doc_id) AS doc_id
        FROM (SELECT md5(text) AS h, doc_id FROM documents)
        GROUP BY h
    ),
    exact AS (
        SELECT d.source, CAST(SUM(d.tok) AS BIGINT) AS exact_tokens
        FROM dtok d JOIN ek ON ek.doc_id = d.doc_id GROUP BY d.source
    ),
    near AS (
        SELECT d.source, CAST(SUM(d.tok) AS BIGINT) AS near_tokens
        FROM clusters c JOIN dtok d ON c.doc_id = d.doc_id
        WHERE c.doc_id = c.cluster_rep GROUP BY d.source
    )
    SELECT r.source, raw_tokens, exact_tokens, near_tokens
    FROM raw r JOIN exact USING (source) JOIN near USING (source)
    ORDER BY source
"""
)

