"""Sequence-pattern / classification / apportionment pack (T23): CEP-style
regex matching over per-session event sequences (the MATCH_RECOGNIZE
capability), a trained-and-applied Naive Bayes language classifier,
largest-remainder sampling-quota apportionment, the LATERAL correlated
top-k SQL surface, and Chao1/Good-Turing unseen-vocabulary estimators.

Reference anchors (SURVEY §2): the reference's procedural client loops
(`Assignment 5/redis_client.py:233-269` SCAN-and-filter; the per-row
HashMap probe `Assignment 7/MongoDB.java:260-267`) are the closest it
gets to sequence/state logic — all of it re-expressed here as engine
operators: sessions via the shared user-keyed window (SURVEY §2.5),
classification as pure grouped aggregates + one broadcast model join,
apportionment as exact integer arithmetic over a tiny aggregate.

Scale notes (100 TB):
- pattern match: ONE user-keyed Exchange (shared with every t17/t18
  session query); the regex runs per session string, whose length the
  session gap bounds — no cross-row state beyond the window.
- Naive Bayes: the model is a (lang × vocab) grid — a broadcast-sized
  side table by construction (vocab is the corpus vocabulary, langs a
  handful); scoring is a ×|langs| fan-out then one doc-keyed aggregate;
  no Python UDFs, all JVM codegen.
- quota/richness: everything after the one corpus-keyed aggregate runs
  on |sources| rows; the global remainder ranking orders the aggregate,
  never raw rows.
- LATERAL: Catalyst decorrelates the per-group top-k into a join +
  per-key TakeOrdered — the same physical shape as the window form.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.operators import text as T
from bigdatamanagement_spark.operators.sessionize import sessionize

# (name, regex) — initials: c=click, e=error, p=purchase, s=signup, v=view.
# Simple greedy patterns with identical non-overlapping leftmost semantics
# in Java regex (Spark regexp_count) and RE2 (DuckDB regexp_extract_all).
_PATTERNS = (
    ("funnel_run", "v+c+p"),
    ("double_purchase", "pp"),
    ("error_storm", "eee"),
)

_SESSION_GAP_S = 1800

# DuckDB token split — the established mirror of operators/text.tokens.
_TOKS = "regexp_split_to_array(lower(trim(text)), '\\s+')"

_QUOTA_BUDGET = 1000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("documents",), register=False)[
        "documents"
    ]


def session_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T23a — CEP sequence-pattern matching (the MATCH_RECOGNIZE
    capability, batch form): each user session (30-min gap) becomes its
    ordered event-type-initial string, and each declared regex pattern
    reports how many sessions contain it and the total non-overlapping
    match count. `v+c+p` is the contiguous browse→click→purchase run,
    `pp` an immediate repurchase, `eee` an error storm.

    Scale: sessionization + string build share ONE user-keyed Exchange
    (operators/sessionize.py); the session string is bounded by session
    length (the 30-min gap caps it); the 3-pattern list is a literal
    broadcast. Regex state is per-row — no cross-session state."""
    ev = _events(spark, sf_dir)
    s = sessionize(ev, "user_id", "ts", _SESSION_GAP_S, order_tiebreak="event_id")
    strings = (
        s.select(
            "user_id",
            "session_seq",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            "event_id",
            F.substring("event_type", 1, 1).alias("ini"),
        )
        .groupBy("user_id", "session_seq")
        .agg(
            F.expr(
                "concat_ws('', transform(array_sort(collect_list("
                "struct(us, event_id, ini))), x -> x.ini))"
            ).alias("seq")
        )
    )
    pats = F.explode(
        F.array(
            *[
                F.struct(F.lit(n).alias("pattern"), F.lit(p).alias("pat"))
                for n, p in _PATTERNS
            ]
        )
    ).alias("p")
    matched = strings.select("seq", pats).select(
        F.col("p.pattern").alias("pattern"),
        F.expr("regexp_count(seq, p.pat)").cast("long").alias("m"),
    )
    return (
        matched.groupBy("pattern")
        .agg(
            F.sum(F.when(F.col("m") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_sessions_matched"),
            F.sum("m").cast("long").alias("n_matches"),
        )
        .orderBy("pattern")
    )


def nb_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT — multinomial Naive Bayes language classifier TRAINED on the
    corpus (add-1 smoothing) and APPLIED back to it, reported as the
    (actual, predicted) confusion matrix — classifier training as a
    pure aggregation plan, the step up from the stopword-heuristic
    lang-ID in operators/text.py. Per-(token, lang) log-likelihoods
    ln((c_tl+1)/(c_l+V)) and per-lang priors ln(n_l/N) are rounded to
    integer micro-nats BEFORE any sum, so the doc score
    prior + Σ count·ll is an exact BIGINT and the argmax (tie → lang
    ASC via struct-min) is cross-engine exact.

    Scale: the model grid is (vocab × langs) rows — broadcast-sized by
    construction; scoring fans each distinct (doc, token) out ×|langs|
    then folds in ONE doc-keyed aggregate. No Python UDF anywhere."""
    d = _documents(spark, sf_dir)
    occ = (
        d.select("doc_id", "lang", F.explode(T.tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "lang", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ctk = occ.groupBy(F.col("lang").alias("plang"), "tok").agg(
        F.sum("cnt").alias("c_tl")
    )
    cl = ctk.groupBy("plang").agg(F.sum("c_tl").alias("c_l"))
    vocab = occ.select("tok").distinct()
    v = vocab.agg(F.count(F.lit(1)).alias("v"))
    langs = d.select(F.col("lang").alias("plang")).distinct()
    priors = (
        d.groupBy(F.col("lang").alias("plang"))
        .agg(F.count(F.lit(1)).alias("n_l"))
        .join(F.broadcast(d.agg(F.count(F.lit(1)).alias("n_docs"))))
        .select(
            "plang",
            F.round(
                F.lit(1000000.0)
                * F.log(F.col("n_l").cast("double") / F.col("n_docs").cast("double")),
                0,
            )
            .cast("long")
            .alias("prior_micro"),
        )
    )
    grid = (
        langs.crossJoin(vocab)
        .join(ctk, ["plang", "tok"], "left")
        .join(cl, "plang")
        .join(F.broadcast(v))
        .select(
            "plang",
            "tok",
            F.round(
                F.lit(1000000.0)
                * F.log(
                    (F.coalesce(F.col("c_tl"), F.lit(0)) + 1).cast("double")
                    / (F.col("c_l") + F.col("v")).cast("double")
                ),
                0,
            )
            .cast("long")
            .alias("ll_micro"),
        )
    )
    scores = (
        occ.join(F.broadcast(grid), "tok")
        .groupBy("doc_id", "lang", "plang")
        .agg(F.sum(F.col("cnt") * F.col("ll_micro")).alias("tok_micro"))
        .join(F.broadcast(priors), "plang")
        .select(
            "doc_id",
            "lang",
            "plang",
            (F.col("prior_micro") + F.col("tok_micro")).alias("score"),
        )
    )
    pred = scores.groupBy("doc_id", "lang").agg(
        F.min(F.struct((-F.col("score")).alias("neg"), F.col("plang").alias("pl")))
        .getField("pl")
        .alias("pred_lang")
    )
    return (
        pred.groupBy(F.col("lang").alias("actual_lang"), "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("actual_lang", "pred_lang")
    )


def sample_quota_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT — largest-remainder (Hamilton) apportionment of a fixed
    sampling budget of 1000 slots across sources, proportional to token
    mass — the exact-integer quota table a stratified corpus sampler
    executes against (floor shares first, the leftover slots to the
    largest remainders, ties → source ASC). Σ quota = budget exactly.

    Scale: ONE corpus aggregate to (source, n_tokens); every later step
    (totals, remainders, the global remainder ranking) runs on that
    |sources|-row table, never on raw rows — the single-task window is
    over the aggregate, not the corpus."""
    d = _documents(spark, sf_dir)
    src = (
        d.select("source", T.token_count(F.col("text")).alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").alias("n_tokens"))
        .localCheckpoint()  # tiny; reused by totals + ranking branches
    )
    tot = src.agg(F.sum("n_tokens").alias("tot"))
    b = F.lit(_QUOTA_BUDGET)
    based = (
        src.join(F.broadcast(tot))
        .select(
            "source",
            "n_tokens",
            (b * F.col("n_tokens")).alias("num"),
            F.col("tot"),
        )
        .select(
            "source",
            "n_tokens",
            F.expr("num div tot").alias("base_quota"),
            F.expr("num % tot").alias("rem"),
        )
    )
    leftover = based.agg(
        (b - F.sum("base_quota")).cast("long").alias("leftover")
    )
    w = Window.orderBy(F.col("rem").desc(), F.col("source").asc())
    return (
        based.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(leftover))
        .select(
            "source",
            "n_tokens",
            "base_quota",
            F.when(F.col("rn") <= F.col("leftover"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("extra"),
            (
                F.col("base_quota")
                + F.when(F.col("rn") <= F.col("leftover"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).cast("long").alias("quota"),
        )
        .orderBy("source")
    )


def lateral_top3_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T23b — LATERAL correlated subquery surface: per market segment,
    the top-3 orders by total price (exact cents, orderkey tiebreak)
    written as a correlated `LATERAL (… ORDER BY … LIMIT 3)` — the
    per-group top-k idiom SQL users reach for; Catalyst decorrelates it
    (DecorrelateInnerQuery) into the same join + per-key limit shape
    the window form plans, proving the surface at full fidelity.

    Scale: decorrelation means the inner query is NOT re-executed per
    outer row — one orders⋈customer join keyed by segment feeds a
    per-segment top-k; no iteration, no driver loop."""
    t = load_testdata(
        spark, sf_dir, tables=("customer", "orders"), register=False
    )
    t["customer"].createOrReplaceTempView("t23_customer")
    t["orders"].createOrReplaceTempView("t23_orders")
    return spark.sql(
        """
        SELECT segs.c_mktsegment, l.o_orderkey, l.cents
        FROM (SELECT DISTINCT c_mktsegment FROM t23_customer) segs,
        LATERAL (
            SELECT o_orderkey,
                   CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
            FROM t23_orders JOIN t23_customer ON o_custkey = c_custkey
            WHERE c_mktsegment = segs.c_mktsegment
            ORDER BY cents DESC, o_orderkey ASC
            LIMIT 3
        ) l
        ORDER BY segs.c_mktsegment, l.cents DESC, l.o_orderkey
        """
    )


def vocab_richness_estimators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT — unseen-vocabulary estimators per source: observed vocab,
    hapax/dis-legomena counts (f1, f2), the Chao1 richness floor
    v_obs + f1(f1−1) div (2(f2+1)) (bias-corrected form — how many
    MORE terms a bigger crawl of this source would surface), and the
    Good-Turing unseen-mass estimate f1/N in floored basis points (the
    probability the NEXT token is novel) — the coverage diagnostics
    next to the Heaps curve (ext_vocab_growth_curve) and Zipf slope.
    All integer arithmetic — cross-engine exact.

    Scale: one (source, token) count aggregate (map-side partials),
    folded to |sources| rows; nothing else touches raw text."""
    d = _documents(spark, sf_dir)
    per = (
        d.select("source", F.explode(T.tokens(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        per.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("v_obs"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("long")
            .alias("f1_hapax"),
            F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
            .cast("long")
            .alias("f2_dis"),
        )
        .select(
            "source",
            "n_tokens",
            "v_obs",
            "f1_hapax",
            "f2_dis",
            F.expr(
                "v_obs + (f1_hapax * (f1_hapax - 1)) div (2 * (f2_dis + 1))"
            ).alias("chao1"),
            F.expr("(10000 * f1_hapax) div n_tokens").alias("gt_unseen_bp"),
        )
        .orderBy("source")
    )


QUERIES = {
    "t23_session_pattern_match": session_pattern_match,
    "t23_lateral_top3_orders": lateral_top3_orders,
    "ext_nb_lang_confusion": nb_lang_confusion,
    "ext_sample_quota_allocation": sample_quota_allocation,
    "ext_vocab_richness": vocab_richness_estimators,
}

_PATTERN_VALUES = ", ".join(f"('{n}', '{p}')" for n, p in _PATTERNS)

ORACLE = {
    "t23_session_pattern_match": f"""
        WITH s AS (
            SELECT user_id, event_id, epoch_us(ts) AS us,
                   substring(event_type, 1, 1) AS ini,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                             > {_SESSION_GAP_S} * 1000000 THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ),
        numbered AS (
            SELECT user_id, us, event_id, ini,
                   SUM(is_new) OVER (PARTITION BY user_id
                                     ORDER BY us ASC, event_id ASC
                                     ROWS UNBOUNDED PRECEDING) + 1 AS session_seq
            FROM s
        ),
        strings AS (
            SELECT user_id, session_seq,
                   string_agg(ini, '' ORDER BY us ASC, event_id ASC) AS seq
            FROM numbered GROUP BY 1, 2
        ),
        pats(pattern, pat) AS (VALUES {_PATTERN_VALUES}),
        matched AS (
            SELECT p.pattern,
                   CAST(len(regexp_extract_all(st.seq, p.pat)) AS BIGINT) AS m
            FROM strings st CROSS JOIN pats p
        )
        SELECT pattern,
               CAST(SUM(CASE WHEN m > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_sessions_matched,
               CAST(SUM(m) AS BIGINT) AS n_matches
        FROM matched GROUP BY pattern ORDER BY pattern
    """,
    "ext_nb_lang_confusion": f"""
        WITH occ AS (
            SELECT doc_id, lang, tok, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (SELECT doc_id, lang, unnest({_TOKS}) AS tok FROM documents)
            GROUP BY 1, 2, 3
        ),
        ctk AS (SELECT lang AS plang, tok, SUM(cnt) AS c_tl FROM occ GROUP BY 1, 2),
        cl AS (SELECT plang, SUM(c_tl) AS c_l FROM ctk GROUP BY 1),
        vocab AS (SELECT DISTINCT tok FROM occ),
        v AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
        langs AS (SELECT DISTINCT lang AS plang FROM documents),
        priors AS (
            SELECT lang AS plang,
                   CAST(round(1000000.0 * ln(
                       CAST(COUNT(*) AS DOUBLE)
                       / (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents)), 0)
                   AS BIGINT) AS prior_micro
            FROM documents GROUP BY 1
        ),
        grid AS (
            SELECT g.plang, g.tok,
                   CAST(round(1000000.0 * ln(
                       CAST(COALESCE(c.c_tl, 0) + 1 AS DOUBLE)
                       / CAST(cl.c_l + v.v AS DOUBLE)), 0) AS BIGINT) AS ll_micro
            FROM (SELECT plang, tok FROM langs CROSS JOIN vocab) g
            LEFT JOIN ctk c ON g.plang = c.plang AND g.tok = c.tok
            JOIN cl ON g.plang = cl.plang
            CROSS JOIN v
        ),
        scores AS (
            SELECT o.doc_id, o.lang, g.plang,
                   p.prior_micro + SUM(o.cnt * g.ll_micro) AS score
            FROM occ o JOIN grid g ON o.tok = g.tok
            JOIN priors p ON g.plang = p.plang
            GROUP BY 1, 2, 3, p.prior_micro
        ),
        pred AS (
            SELECT doc_id, lang, plang AS pred_lang,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, plang ASC) AS rn
            FROM scores
        )
        SELECT lang AS actual_lang, pred_lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM pred WHERE rn = 1
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "ext_sample_quota_allocation": f"""
        WITH src AS (
            SELECT source, CAST(SUM(len({_TOKS})) AS BIGINT) AS n_tokens
            FROM documents GROUP BY 1
        ),
        tot AS (SELECT SUM(n_tokens) AS tot FROM src),
        based AS (
            SELECT source, n_tokens,
                   CAST(({_QUOTA_BUDGET} * n_tokens) // tot AS BIGINT)
                       AS base_quota,
                   CAST(({_QUOTA_BUDGET} * n_tokens) % tot AS BIGINT) AS rem
            FROM src CROSS JOIN tot
        ),
        lo AS (SELECT {_QUOTA_BUDGET} - SUM(base_quota) AS leftover FROM based),
        ranked AS (
            SELECT *, row_number() OVER (ORDER BY rem DESC, source ASC) AS rn
            FROM based
        )
        SELECT source, n_tokens, base_quota,
               CAST(CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS BIGINT) AS extra,
               CAST(base_quota + CASE WHEN rn <= leftover THEN 1 ELSE 0 END
                   AS BIGINT) AS quota
        FROM ranked CROSS JOIN lo
        ORDER BY source
    """,
    "t23_lateral_top3_orders": """
        SELECT segs.c_mktsegment, l.o_orderkey, l.cents
        FROM (SELECT DISTINCT c_mktsegment FROM customer) segs,
        LATERAL (
            SELECT o_orderkey,
                   CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = segs.c_mktsegment
            ORDER BY cents DESC, o_orderkey ASC
            LIMIT 3
        ) l
        ORDER BY segs.c_mktsegment, l.cents DESC, l.o_orderkey
    """,
    "ext_vocab_richness": f"""
        WITH per AS (
            SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT source, unnest({_TOKS}) AS tok FROM documents)
            GROUP BY 1, 2
        ),
        agg AS (
            SELECT source,
                   CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS v_obs,
                   CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS f1_hapax,
                   CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
                       AS f2_dis
            FROM per GROUP BY 1
        )
        SELECT source, n_tokens, v_obs, f1_hapax, f2_dis,
               v_obs + (f1_hapax * (f1_hapax - 1)) // (2 * (f2_dis + 1)) AS chao1,
               (10000 * f1_hapax) // n_tokens AS gt_unseen_bp
        FROM agg ORDER BY source
    """,
}
