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


def position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T23c — position-based (U-shaped) multi-touch attribution, the
    third member of the attribution family (last-touch t19g gives the
    nearest touch everything; time-decay t21e halves per step back):
    each purchase's click/view touches in the preceding 8-event window
    split 1,000,000 micro-credits as 40% first / 40% last / 20% spread
    over the middles (solo touch takes all; a pair splits 50/50). The
    middle split uses integer div; its remainder rides on the FIRST
    touch, so Σ credits = 1e6 × attributed purchases EXACTLY. Output
    per (channel, role ∈ solo/first/middle/last): touches + credit.

    Scale: the same one user-keyed window as t21e (≤8-element lists);
    the explode is bounded by 8× the purchase count."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-8, -1)
    )
    touches = (
        ev.withColumn("hist", F.collect_list("event_type").over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            F.expr("filter(hist, t -> t IN ('click', 'view'))").alias("fh")
        )
        .filter(F.size("fh") > 0)
        .select(F.size("fh").alias("m"), F.posexplode("fh").alias("pos", "ch"))
    )
    credit = (
        F.when(F.col("m") == 1, F.lit(1000000))
        .when(F.col("m") == 2, F.lit(500000))
        .when(F.col("pos") == 0, F.lit(400000) + F.expr("200000 % (m - 2)"))
        .when(F.col("pos") == F.col("m") - 1, F.lit(400000))
        .otherwise(F.expr("200000 div (m - 2)"))
        .cast("long")
    )
    role = (
        F.when(F.col("m") == 1, F.lit("solo"))
        .when(F.col("pos") == 0, F.lit("first"))
        .when(F.col("pos") == F.col("m") - 1, F.lit("last"))
        .otherwise(F.lit("middle"))
    )
    return (
        touches.select(F.col("ch").alias("channel"), role.alias("role"), credit.alias("credit"))
        .groupBy("channel", "role")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.sum("credit").cast("long").alias("credit_micro"),
        )
        .orderBy("channel", "role")
    )


def user_feature_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T23d — per-user ML feature-store snapshot: the wide feature row
    a churn/LTV model trains on, assembled engine-side — event volume,
    session count (30-min gap), purchase count + exact micro spend,
    error rate (bp), behavioral breadth (distinct types), recency and
    tenure in whole seconds against the corpus high-water-mark. The
    feature-engineering materialization every training pipeline runs
    before the model ever sees data.

    Scale: sessionization and the per-user fold share ONE user-keyed
    Exchange; the corpus max timestamp is a 1-row broadcast. Output is
    |users| rows — the natural feature-store grain."""
    ev = _events(spark, sf_dir)
    s = sessionize(ev, "user_id", "ts", _SESSION_GAP_S, order_tiebreak="event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    per_user = s.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max("session_seq").cast("long").alias("n_sessions"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_purchases"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.expr("CAST(round(value * 1000000.0, 0) AS BIGINT)"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("purchase_micro"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_err"),
        F.count_distinct("event_type").cast("long").alias("n_types"),
        F.min(us).alias("first_us"),
        F.max(us).alias("last_us"),
    )
    hwm = ev.agg(F.max(us).alias("corpus_max_us"))
    return (
        per_user.join(F.broadcast(hwm))
        .select(
            "user_id",
            "n_events",
            "n_sessions",
            "n_purchases",
            "purchase_micro",
            F.expr("(10000 * n_err) div n_events").alias("error_bp"),
            "n_types",
            F.expr("(corpus_max_us - last_us) div 1000000").alias("recency_s"),
            F.expr("(last_us - first_us) div 1000000").alias("tenure_s"),
        )
        .orderBy("user_id")
    )


def hourly_gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T23e — dense hourly grid per event_type with LINEAR interpolation
    through the gaps (the interpolate() twin of the LOCF fill in
    t17_hourly_gapfill_locf): a missing hour takes
    ((d−k)·v_prev + k·v_next) div d between its nearest observed
    neighbors (k hours past the previous anchor, d hours between
    anchors) — exact integer lerp, non-negative throughout (values are
    ≥ 0), so truncating div == floor on both engines. The grid is
    bounded by each type's observed span, so every gap has both
    anchors.

    Scale: the grid fan-out is bounded by span-hours × |types|; the
    anchor carries are four IGNORE-NULLS window passes over the SAME
    type-keyed ordering — one Exchange, no joins beyond the grid."""
    ev = _events(spark, sf_dir)
    hourly = (
        ev.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
        )
        .agg(
            F.sum(F.expr("CAST(round(value * 1000000.0, 0) AS BIGINT)")).alias(
                "sum_micro"
            )
        )
    )
    grid = (
        hourly.groupBy("event_type")
        .agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.expr("sequence(lo, hi, interval 1 hour)")
            ).alias("hr"),
        )
    )
    filled = grid.join(hourly, ["event_type", "hr"], "left").withColumn(
        "t", F.expr("unix_micros(hr) div 3600000000")
    )
    wb = (
        Window.partitionBy("event_type")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("t")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    anchor_t = F.when(F.col("sum_micro").isNotNull(), F.col("t"))
    x = filled.select(
        "event_type",
        "hr",
        "t",
        "sum_micro",
        F.last("sum_micro", ignorenulls=True).over(wb).alias("vp"),
        F.last(anchor_t, ignorenulls=True).over(wb).alias("tp"),
        F.first("sum_micro", ignorenulls=True).over(wf).alias("vn"),
        F.first(anchor_t, ignorenulls=True).over(wf).alias("tn"),
    )
    interp = F.expr(
        "((tn - t) * vp + (t - tp) * vn) div (tn - tp)"
    )
    return x.select(
        "event_type",
        # ntz: Arrow export must not carry a UTC offset the SQL oracle lacks
        F.col("hr").cast("timestamp_ntz").alias("hr"),
        F.when(F.col("sum_micro").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_gap"),
        F.coalesce(F.col("sum_micro"), interp).cast("long").alias("v_micro"),
    ).orderBy("event_type", "hr")


def target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT — leave-one-out target encoding of hour-of-day against the
    purchase label (the categorical-encoding staple of tabular ML,
    done the leakage-safe way): each row's encoding is the category's
    positive rate EXCLUDING the row itself, (s_c − y)·1e6 div (n_c − 1)
    in exact integer micros. Reported per (hour, label): row count and
    the encoding (constant within the cell by construction — the
    oracle-checkable face of a per-row transform). LOO(y=1) < LOO(y=0)
    within every category, pinned in tests: self-exclusion is exactly
    what blocks target leakage.

    Scale: one 24-row category aggregate broadcast back onto rows,
    then one (category, label) fold — no window, no per-row state."""
    ev = _events(spark, sf_dir).select(
        F.hour("ts").cast("long").alias("hod"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .cast("long")
        .alias("y"),
    )
    cat = ev.groupBy("hod").agg(
        F.count(F.lit(1)).alias("n_c"), F.sum("y").alias("s_c")
    )
    return (
        ev.join(F.broadcast(cat), "hod")
        .filter(F.col("n_c") > 1)
        .select(
            "hod",
            "y",
            F.expr("((s_c - y) * 1000000) div (n_c - 1)").alias("loo_micro"),
        )
        .groupBy("hod", "y")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("loo_micro").cast("long").alias("loo_micro"),
        )
        .orderBy("hod", "y")
    )


def next_purchase_wait(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T24a — FORWARD as-of join (operators/asof.asof_join_forward):
    every non-purchase event attached to the same user's next purchase
    at-or-after it, reported as the wait in whole seconds (NULL when
    the user never purchases again) — the time-to-conversion view of
    the backward attribution in t17_last_purchase_asof. The right side
    is pre-aggregated to distinct (user, instant) purchase times, so
    the carried payload is unambiguous.

    Scale: one user-keyed shuffle of left+right and a single backward
    sweep with O(1) carried state — the same lower bound a sort-merge
    join would pay; no range self-join, no per-key loop."""
    from bigdatamanagement_spark.operators.asof import asof_join_forward

    ev = _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    left = ev.filter(F.col("event_type") != "purchase")
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("us").alias("p_us"))
        .distinct()
    )
    j = asof_join_forward(left, right, on="user_id", left_ts="us", right_ts="p_us")
    return j.select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("(p_us - us) div 1000000").alias("wait_s"),
    ).orderBy("event_id")


def session_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T24b — session entry/exit analysis (the landing/exit-page matrix
    of web analytics, on event types): per (entry_type, exit_type) the
    session count and how many are single-event bounces — where
    journeys start, where they die. Entry/exit come from a
    lexicographic struct-min/max over (ts, event_id, type), so the
    pick is engine-exact.

    Scale: sessionization and the per-session fold share the ONE
    user-keyed Exchange; the matrix is ≤ |types|² rows."""
    ev = _events(spark, sf_dir)
    s = sessionize(ev, "user_id", "ts", _SESSION_GAP_S, order_tiebreak="event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    per_session = s.select(
        "user_id", "session_seq", us.alias("us"), "event_id", "event_type"
    ).groupBy("user_id", "session_seq").agg(
        F.min(F.struct("us", "event_id", "event_type"))
        .getField("event_type")
        .alias("entry_type"),
        F.max(F.struct("us", "event_id", "event_type"))
        .getField("event_type")
        .alias("exit_type"),
        F.count(F.lit(1)).alias("n_ev"),
    )
    return (
        per_session.groupBy("entry_type", "exit_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum(F.when(F.col("n_ev") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_bounce"),
        )
        .orderBy("entry_type", "exit_type")
    )


# CUPED closed form — ONE expression string evaluated by both engines
# (identical parse tree ⇒ identical IEEE doubles ⇒ identical rounding).
# Moments are exact BIGINTs cast to double BEFORE any product (n·Sxx
# overflows BIGINT at scale — the Zipf-OLS lesson).
_CUPED_THETA = (
    "((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
)
_CUPED_RAW = (
    "(CAST(y1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    " - CAST(y0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
)
_CUPED_XDIFF = (
    "(CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    " - CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
)


def cuped_ab_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT — CUPED variance-reduced A/B readout (Deng et al., WSDM'13):
    the md5-parity user split of t19's z-test, but the post-period
    spend delta is adjusted by each user's PRE-period spend
    (θ = cov(x,y)/var(x), pooled): diff_cuped = Δȳ − θ·Δx̄ — the
    experiment-platform standard for cutting metric variance with
    pre-exposure data. Per-user pre/post centi sums and the five
    moments are exact BIGINTs; θ and the deltas are ONE shared
    expression string evaluated by both engines (identical IEEE tree).
    Periods split at the integer-div midpoint instant.

    Scale: one user-keyed fold to (bucket, x, y), then a 1-row moment
    aggregate — no window, no join beyond two 1-row broadcasts."""
    ev = _events(spark, sf_dir)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    span = ev.agg(F.min(us).alias("lo"), F.max(us).alias("hi")).select(
        F.expr("(lo + hi) div 2").alias("mid_us")
    )
    centi = F.expr("CAST(round(value * 100.0, 0) AS BIGINT)")
    per_user = (
        ev.select("user_id", "event_type", us.alias("us"), centi.alias("centi"))
        .join(F.broadcast(span))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("us") < F.col("mid_us")),
                    F.col("centi"),
                ).otherwise(F.lit(0))
            ).alias("x"),
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("us") >= F.col("mid_us")),
                    F.col("centi"),
                ).otherwise(F.lit(0))
            ).alias("y"),
        )
        .select(
            (
                F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
                .cast("long")
                % 2
            ).alias("bucket"),
            "x",
            "y",
        )
    )
    m = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.when(F.col("bucket") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("bucket") == 1, F.col("x")).otherwise(0)).alias("x1"),
        F.sum(F.when(F.col("bucket") == 1, F.col("y")).otherwise(0)).alias("y1"),
        F.sum(F.when(F.col("bucket") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("bucket") == 0, F.col("x")).otherwise(0)).alias("x0"),
        F.sum(F.when(F.col("bucket") == 0, F.col("y")).otherwise(0)).alias("y0"),
    )
    return m.select(
        F.col("n1").cast("long").alias("n_treat"),
        F.col("n0").cast("long").alias("n_ctrl"),
        F.expr(f"CAST(round(1000000.0 * {_CUPED_THETA}, 0) AS BIGINT)").alias(
            "theta_micro"
        ),
        F.expr(f"CAST(round(1000000.0 * {_CUPED_RAW}, 0) AS BIGINT)").alias(
            "raw_diff_micro"
        ),
        F.expr(
            f"CAST(round(1000000.0 * ({_CUPED_RAW} - {_CUPED_THETA} * {_CUPED_XDIFF}), 0)"
            " AS BIGINT)"
        ).alias("cuped_diff_micro"),
    )


# 3×3 Cramer solve for y ~ 1 + x1 + x2, shared by both engines: every
# moment is an exact BIGINT cast to double before any product.
def _cramer_exprs() -> dict[str, str]:
    d = {c: f"CAST({c} AS DOUBLE)" for c in
         ("n", "s1", "s2", "sy", "s11", "s22", "s12", "s1y", "s2y")}
    det = (
        f"({d['n']} * ({d['s11']} * {d['s22']} - {d['s12']} * {d['s12']})"
        f" - {d['s1']} * ({d['s1']} * {d['s22']} - {d['s12']} * {d['s2']})"
        f" + {d['s2']} * ({d['s1']} * {d['s12']} - {d['s11']} * {d['s2']}))"
    )
    det0 = (
        f"({d['sy']} * ({d['s11']} * {d['s22']} - {d['s12']} * {d['s12']})"
        f" - {d['s1']} * ({d['s1y']} * {d['s22']} - {d['s12']} * {d['s2y']})"
        f" + {d['s2']} * ({d['s1y']} * {d['s12']} - {d['s11']} * {d['s2y']}))"
    )
    det1 = (
        f"({d['n']} * ({d['s1y']} * {d['s22']} - {d['s12']} * {d['s2y']})"
        f" - {d['sy']} * ({d['s1']} * {d['s22']} - {d['s12']} * {d['s2']})"
        f" + {d['s2']} * ({d['s1']} * {d['s2y']} - {d['s1y']} * {d['s2']}))"
    )
    det2 = (
        f"({d['n']} * ({d['s11']} * {d['s2y']} - {d['s1y']} * {d['s12']})"
        f" - {d['s1']} * ({d['s1']} * {d['s2y']} - {d['s1y']} * {d['s2']})"
        f" + {d['sy']} * ({d['s1']} * {d['s12']} - {d['s11']} * {d['s2']}))"
    )
    return {
        "b0": f"CAST(round(1000000.0 * ({det0} / {det}), 0) AS BIGINT)",
        "b1": f"CAST(round(1000000.0 * ({det1} / {det}), 0) AS BIGINT)",
        "b2": f"CAST(round(1000000.0 * ({det2} / {det}), 0) AS BIGINT)",
    }


_CRAMER = _cramer_exprs()


def multi_ols_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T24c — MULTIPLE linear regression per event_type (two
    regressors: value_centi ~ props.k + hour-of-day), solved in closed
    form from the nine exact-BIGINT normal-equation moments via
    Cramer's rule — the step past the simple OLS of
    t18_ols_value_on_prop. The 3×3 solve is ONE expression string
    evaluated by both engines on doubles cast from exact integers
    (identical parse tree ⇒ identical IEEE result ⇒ identical micro
    rounding).

    Scale: one type-keyed moment aggregate over one scan (map-side
    partials); the solve runs on |types| rows."""
    ev = _events(spark, sf_dir)
    rows = ev.select(
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("x1"),
        F.hour("ts").cast("long").alias("x2"),
        F.expr("CAST(round(value * 100.0, 0) AS BIGINT)").alias("y"),
    ).filter(F.col("x1").isNotNull())
    m = rows.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
    )
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.expr(_CRAMER["b0"]).alias("b0_micro"),
        F.expr(_CRAMER["b1"]).alias("b1_micro"),
        F.expr(_CRAMER["b2"]).alias("b2_micro"),
    ).orderBy("event_type")


QUERIES = {
    "t23_session_pattern_match": session_pattern_match,
    "t24_next_purchase_wait": next_purchase_wait,
    "t24_session_entry_exit": session_entry_exit,
    "t24_multi_ols_value": multi_ols_value,
    "ext_cuped_ab_adjustment": cuped_ab_adjustment,
    "t23_position_attribution": position_attribution,
    "t23_user_feature_snapshot": user_feature_snapshot,
    "t23_hourly_gapfill_interp": hourly_gapfill_interp,
    "ext_target_encoding_loo": target_encoding_loo,
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
    "t23_position_attribution": """
        WITH ev AS (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS us
            FROM events
        ),
        h AS (
            SELECT event_type,
                   list(event_type) OVER (PARTITION BY user_id
                       ORDER BY us, event_id
                       ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING) AS hist
            FROM ev
        ),
        f AS (
            SELECT list_filter(hist, t -> t IN ('click', 'view')) AS fh
            FROM h WHERE event_type = 'purchase'
        ),
        x AS (
            SELECT fh[i] AS channel, i, len(fh) AS m
            FROM f, unnest(generate_series(1, len(fh))) AS g(i)
            WHERE len(fh) > 0
        ),
        credited AS (
            SELECT channel,
                   CASE WHEN m = 1 THEN 'solo'
                        WHEN i = 1 THEN 'first'
                        WHEN i = m THEN 'last'
                        ELSE 'middle' END AS role,
                   CAST(CASE WHEN m = 1 THEN 1000000
                             WHEN m = 2 THEN 500000
                             WHEN i = 1 THEN 400000 + 200000 % (m - 2)
                             WHEN i = m THEN 400000
                             ELSE 200000 // (m - 2) END AS BIGINT) AS credit
            FROM x
        )
        SELECT channel, role,
               CAST(COUNT(*) AS BIGINT) AS n_touches,
               CAST(SUM(credit) AS BIGINT) AS credit_micro
        FROM credited GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "t23_user_feature_snapshot": f"""
        WITH s AS (
            SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                             > {_SESSION_GAP_S} * 1000000 THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ),
        numbered AS (
            SELECT *, SUM(is_new) OVER (PARTITION BY user_id
                          ORDER BY us ASC, event_id ASC
                          ROWS UNBOUNDED PRECEDING) + 1 AS session_seq
            FROM s
        ),
        per_user AS (
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(MAX(session_seq) AS BIGINT) AS n_sessions,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_purchases,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                            THEN CAST(round(value * 1000000.0, 0) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS purchase_micro,
                   SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_err,
                   CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
                   MIN(us) AS first_us,
                   MAX(us) AS last_us
            FROM numbered GROUP BY 1
        ),
        hwm AS (SELECT MAX(epoch_us(ts)) AS corpus_max_us FROM events)
        SELECT user_id, n_events, n_sessions, n_purchases, purchase_micro,
               CAST((10000 * n_err) // n_events AS BIGINT) AS error_bp,
               n_types,
               CAST((corpus_max_us - last_us) // 1000000 AS BIGINT) AS recency_s,
               CAST((last_us - first_us) // 1000000 AS BIGINT) AS tenure_s
        FROM per_user CROSS JOIN hwm
        ORDER BY user_id
    """,
    "t23_hourly_gapfill_interp": """
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hr,
                   SUM(CAST(round(value * 1000000.0, 0) AS BIGINT)) AS sum_micro
            FROM events GROUP BY 1, 2
        ),
        spans AS (SELECT event_type, min(hr) AS lo, max(hr) AS hi
                  FROM hourly GROUP BY 1),
        grid AS (SELECT event_type,
                        unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
                 FROM spans),
        filled AS (
            SELECT g.event_type, g.hr, h.sum_micro,
                   epoch_us(g.hr) // 3600000000 AS t
            FROM grid g LEFT JOIN hourly h USING (event_type, hr)
        ),
        anchored AS (
            SELECT event_type, hr, t, sum_micro,
                   last_value(sum_micro IGNORE NULLS) OVER wb AS vp,
                   last_value(CASE WHEN sum_micro IS NOT NULL THEN t END
                              IGNORE NULLS) OVER wb AS tp,
                   first_value(sum_micro IGNORE NULLS) OVER wf AS vn,
                   first_value(CASE WHEN sum_micro IS NOT NULL THEN t END
                               IGNORE NULLS) OVER wf AS tn
            FROM filled
            WINDOW wb AS (PARTITION BY event_type ORDER BY t
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   wf AS (PARTITION BY event_type ORDER BY t
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT event_type, hr,
               CAST(CASE WHEN sum_micro IS NULL THEN 1 ELSE 0 END AS BIGINT)
                   AS is_gap,
               CAST(COALESCE(sum_micro,
                    ((tn - t) * vp + (t - tp) * vn) // (tn - tp))
                   AS BIGINT) AS v_micro
        FROM anchored ORDER BY event_type, hr
    """,
    "ext_target_encoding_loo": """
        WITH ev AS (
            SELECT CAST(hour(ts) AS BIGINT) AS hod,
                   CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS BIGINT) AS y
            FROM events
        ),
        cat AS (SELECT hod, COUNT(*) AS n_c, SUM(y) AS s_c FROM ev GROUP BY 1)
        SELECT ev.hod, ev.y,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(((s_c - ev.y) * 1000000) // (n_c - 1)) AS BIGINT)
                   AS loo_micro
        FROM ev JOIN cat ON ev.hod = cat.hod
        WHERE n_c > 1
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "t24_next_purchase_wait": """
        WITH ev AS (
            SELECT event_id, user_id, event_type, epoch_us(ts) AS us
            FROM events
        ),
        nxt AS (
            SELECT event_id, user_id, event_type, us,
                   min(CASE WHEN event_type = 'purchase' THEN us END) OVER (
                       PARTITION BY user_id ORDER BY us
                       RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                   ) AS p_us
            FROM ev
        )
        SELECT event_id, user_id, event_type,
               CAST((p_us - us) // 1000000 AS BIGINT) AS wait_s
        FROM nxt WHERE event_type <> 'purchase'
        ORDER BY event_id
    """,
    "t24_session_entry_exit": f"""
        WITH s AS (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                             > {_SESSION_GAP_S} * 1000000 THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ),
        numbered AS (
            SELECT *, SUM(is_new) OVER (PARTITION BY user_id
                          ORDER BY us ASC, event_id ASC
                          ROWS UNBOUNDED PRECEDING) + 1 AS session_seq
            FROM s
        ),
        per_session AS (
            SELECT user_id, session_seq,
                   first(event_type ORDER BY us ASC, event_id ASC) AS entry_type,
                   last(event_type ORDER BY us ASC, event_id ASC) AS exit_type,
                   COUNT(*) AS n_ev
            FROM numbered GROUP BY 1, 2
        )
        SELECT entry_type, exit_type,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_bounce
        FROM per_session GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "ext_cuped_ab_adjustment": f"""
        WITH span AS (
            SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid_us
            FROM events
        ),
        per_user AS (
            SELECT ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                       % 2 AS bucket,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                                  AND epoch_us(ts) < mid_us
                            THEN CAST(round(value * 100.0, 0) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS x,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                                  AND epoch_us(ts) >= mid_us
                            THEN CAST(round(value * 100.0, 0) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS y
            FROM events CROSS JOIN span
            GROUP BY user_id
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(x * y) AS BIGINT) AS sxy,
                   CAST(SUM(CASE WHEN bucket = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                   CAST(SUM(CASE WHEN bucket = 1 THEN x ELSE 0 END) AS BIGINT) AS x1,
                   CAST(SUM(CASE WHEN bucket = 1 THEN y ELSE 0 END) AS BIGINT) AS y1,
                   CAST(SUM(CASE WHEN bucket = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
                   CAST(SUM(CASE WHEN bucket = 0 THEN x ELSE 0 END) AS BIGINT) AS x0,
                   CAST(SUM(CASE WHEN bucket = 0 THEN y ELSE 0 END) AS BIGINT) AS y0
            FROM per_user
        )
        SELECT n1 AS n_treat, n0 AS n_ctrl,
               CAST(round(1000000.0 * {_CUPED_THETA}, 0) AS BIGINT) AS theta_micro,
               CAST(round(1000000.0 * {_CUPED_RAW}, 0) AS BIGINT) AS raw_diff_micro,
               CAST(round(1000000.0 * ({_CUPED_RAW} - {_CUPED_THETA} * {_CUPED_XDIFF}), 0)
                   AS BIGINT) AS cuped_diff_micro
        FROM m
    """,
    "t24_multi_ols_value": f"""
        WITH rows_f AS (
            SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS x1,
                   CAST(hour(ts) AS BIGINT) AS x2,
                   CAST(round(value * 100.0, 0) AS BIGINT) AS y
            FROM events
            WHERE json_extract_string(props, '$.k') IS NOT NULL
        ),
        m AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x1) AS BIGINT) AS s1,
                   CAST(SUM(x2) AS BIGINT) AS s2,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x1 * x1) AS BIGINT) AS s11,
                   CAST(SUM(x2 * x2) AS BIGINT) AS s22,
                   CAST(SUM(x1 * x2) AS BIGINT) AS s12,
                   CAST(SUM(x1 * y) AS BIGINT) AS s1y,
                   CAST(SUM(x2 * y) AS BIGINT) AS s2y
            FROM rows_f GROUP BY 1
        )
        SELECT event_type, n,
               {_CRAMER["b0"]} AS b0_micro,
               {_CRAMER["b1"]} AS b1_micro,
               {_CRAMER["b2"]} AS b2_micro
        FROM m ORDER BY event_type
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
