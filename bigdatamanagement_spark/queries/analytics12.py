"""Markov-attribution / econometrics / text-metrics pack (T30):
Markov-chain removal-effect attribution over user journeys (THE
data-driven attribution model past the rule-based last-touch /
time-decay / U-shaped family), log-log price-elasticity regression
per brand, a Simpson's-paradox detector (pooled vs per-group slope
sign reversal), and corpus Flesch reading-ease per document source.

Reference anchors (SURVEY §2): the reference's recommendation SQL
(`ipynb:1470-1546`) and the engine's attribution family (t19 last
-touch, t21 time-decay, t23 U-shaped) are all rule-based — the Markov
removal effect is the model-based upgrade every marketing-analytics
stack ships; elasticity regresses the reference's price/quantity
columns (TPC-H lineitem) the way its revenue queries only aggregate
them; the paradox detector guards every "grouped AVG" readout the
reference prints.

Scale notes (100 TB):
- Markov: journeys collapse to a (src, dst) transition-count
  aggregate (states = 4 touch channels + start/conv/null, so the
  chain is TINY regardless of data size); probabilities are floored
  integer micro (1e6*c DIV total); 8 propagation rounds x 5 variants
  run as joins on the <=50-row edge table — bounded iteration, no
  driver loop over data.
- elasticity: log features floored to exact micro-nats, five BIGINT
  moments per brand, slope/intercept cast to double BEFORE any
  product (the Zipf-overflow lesson, commit 0234676).
- paradox: slope SIGN is the integer sign of n*sxy - sx*sy — no
  doubles anywhere in the detection.
- Flesch: counts aggregate per source FIRST (exact BIGINTs), the
  score evaluates once per source — never an average of per-doc
  doubles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata

_TOUCHES = ("click", "error", "signup", "view")
_MK_ROUNDS = 8
_MICRO = 1_000_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


def _journey_edges(ev: DataFrame) -> DataFrame:
    """(src, dst, c): journey transition counts. Per user, the touch
    sequence is every non-purchase event strictly before the user's
    first purchase (all events if the user never purchases), ordered
    by (ts, event_id); edges are start->first, consecutive touches,
    last->conv|null, and start->conv|null for touchless users."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    base = ev.select(
        "user_id", "event_type", us.alias("us"), "event_id"
    )
    first_p = (
        base.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("us").alias("p_us"))
    )
    tagged = base.join(first_p, "user_id", "left")
    touches = tagged.filter(
        (F.col("event_type") != "purchase")
        & (F.col("p_us").isNull() | (F.col("us") < F.col("p_us")))
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    seq = touches.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.lead("event_type").over(w).alias("nxt"),
        F.col("p_us").isNotNull().alias("conv"),
    )
    end = F.when(F.col("conv"), F.lit("conv")).otherwise(F.lit("null"))
    inner = seq.select(
        F.col("event_type").alias("src"),
        F.coalesce(F.col("nxt"), end).alias("dst"),
    )
    starts = seq.filter(F.col("rn") == 1).select(
        F.lit("start").alias("src"), F.col("event_type").alias("dst")
    )
    touchless = (
        base.groupBy("user_id")
        .agg(F.min("us").alias("u0"))
        .join(first_p, "user_id", "left")
        .join(seq.filter(F.col("rn") == 1).select("user_id"), "user_id", "left_anti")
        .select(
            F.lit("start").alias("src"),
            F.when(F.col("p_us").isNotNull(), F.lit("conv"))
            .otherwise(F.lit("null"))
            .alias("dst"),
        )
    )
    return (
        inner.unionByName(starts)
        .unionByName(touchless)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T30a — Markov-chain removal-effect attribution: user journeys
    (start -> touch channels -> conv|null) become a transition matrix
    in floored integer micro-probabilities (1e6*c DIV row_total); the
    base conversion mass and, per channel, the mass with that channel
    removed (its in-edges redirected to null, out-edges dropped, base
    denominators kept — the standard removal effect) propagate through
    8 bounded rounds of integer vector-matrix products (each term
    v*p DIV 1e6, order-free BIGINT arithmetic). Attribution share =
    each channel's removal effect over the fixed-order 4-term sum.
    The model-based upgrade of the t19/t21/t23 rule-based family.

    Scale: everything after ONE user-keyed journey aggregate runs on a
    <=50-row edge table x 5 variants; 8 rounds is the bounded-
    iteration discipline (residual un-absorbed mass after round 8 is
    deterministic and identical on both engines)."""
    edges = _journey_edges(_events(spark, sf_dir))
    p = edges.select(
        "src",
        "dst",
        F.expr(f"({_MICRO} * c) DIV SUM(c) OVER (PARTITION BY src)").alias(
            "p"
        ),
    )
    # The transition matrix is PROVABLY bounded metadata — at most
    # (|event types| + start/conv/null)^2 rows regardless of corpus
    # size — so everything after the one journey aggregate runs on the
    # driver (the measured-small discipline of cluster._driver_components):
    # the former 8 eager/lazy Spark rounds over a <=35-row vector paid
    # ~16 sequential tiny-shuffle stage waves (~2.5 s of pure scheduling)
    # for microseconds of integer arithmetic. Same floored-integer ops in
    # the same order; the DuckDB oracle (unrolled CTE rounds) is the
    # cross-engine witness that the values are unchanged.
    base_edges = [
        (r["src"], r["dst"], r["p"]) for r in p.collect()
    ] + [("conv", "conv", _MICRO), ("null", "null", _MICRO)]
    variants = ["base"] + list(_TOUCHES)
    vedges: dict[tuple[str, str, str], int] = {}
    for variant in variants:
        for src, dst, pm in base_edges:
            if variant != "base" and src == variant:
                continue
            d = "null" if (variant != "base" and dst == variant) else dst
            k = (variant, src, d)
            vedges[k] = vedges.get(k, 0) + pm
    v: dict[tuple[str, str], int] = {(vt, "start"): _MICRO for vt in variants}
    for _ in range(_MK_ROUNDS):
        nxt: dict[tuple[str, str], int] = {}
        for (variant, src, dst), pm in vedges.items():
            mass = v.get((variant, src))
            if mass is not None:
                k = (variant, dst)
                nxt[k] = nxt.get(k, 0) + (mass * pm) // _MICRO
        v = nxt
    conv = {vt: m for (vt, st), m in v.items() if st == "conv"}
    rows = []
    if "base" in conv:
        base_micro = conv["base"]
        rem = [
            (vt, base_micro, conv[vt], base_micro - conv[vt])
            for vt in conv
            if vt != "base"
        ]
        tot = sum(r[3] for r in rem)
        rows = [
            (ch, bm, cm, rm, float(rm) / float(tot))
            for ch, bm, cm, rm in rem
        ]
    return spark.createDataFrame(
        rows,
        "channel string, base_micro long, conv_micro long,"
        " removal_micro long, share double",
    ).orderBy("channel")


_ELASTICITY = (
    "((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
)


def price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T30b — log-log price elasticity per brand: regress
    ln(quantity) on ln(unit price cents) across lineitems (unit price
    = extendedprice/quantity, floored to cents) — the econometric
    readout of the price/quantity columns the reference only ever
    aggregates. Both logs floor to exact micro-nats so the five OLS
    moments are BIGINTs; the slope casts every moment to double
    BEFORE any product (the Zipf-overflow lesson).

    Scale: one lineitem scan -> one brand-keyed moment aggregate
    (part dim broadcast); output is |brands| rows."""
    t = load_testdata(
        spark, sf_dir, tables=("lineitem", "part"), register=False
    )
    unit_cents = "CAST(floor(l_extendedprice * 100 / l_quantity) AS BIGINT)"
    lx = f"CAST(floor(1000000.0 * ln(CAST({unit_cents} AS DOUBLE))) AS BIGINT)"
    ly = "CAST(floor(1000000.0 * ln(CAST(l_quantity AS DOUBLE))) AS BIGINT)"
    base = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("p_brand", F.expr(lx).alias("x"), F.expr(ly).alias("y"))
    )
    agg = base.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    return agg.select(
        "p_brand", "n", F.expr(_ELASTICITY).alias("elasticity")
    ).orderBy("p_brand")


def simpson_paradox_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T30c — Simpson's-paradox detector: the SIGN of the value~hour
    regression slope per event type vs pooled over all events; a type
    whose sign opposes the pooled sign is an aggregation reversal —
    the guard every "grouped AVG" dashboard needs. Detection is pure
    BIGINT arithmetic: sign(n*sxy - sx*sy) (the slope's numerator;
    the positive denominator never flips it).

    Scale: one (type) moment aggregate + a broadcast pooled row."""
    ev = _events(spark, sf_dir)
    base = ev.select(
        "event_type",
        F.hour("ts").cast("long").alias("x"),
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("y"),
    )
    def moments(df, keys):
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        )
    per = moments(base, ["event_type"]).select(
        "event_type",
        "n",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias(
            "slope_num"
        ),
    )
    pooled = moments(base.withColumn("g", F.lit(1)), ["g"]).select(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias(
            "pooled_num"
        )
    )
    return (
        per.join(F.broadcast(pooled))
        .select(
            "event_type",
            "n",
            "slope_num",
            "pooled_num",
            (F.signum("slope_num") * F.signum("pooled_num") < 0).alias(
                "reversed"
            ),
        )
        .orderBy("event_type")
    )


_FLESCH = (
    "(206.835 - 1.015 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))"
    " - 84.6 * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE)))"
)


def flesch_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T30d — corpus Flesch reading-ease per document source: word /
    sentence / syllable-proxy (vowel-group) counts aggregate to exact
    per-source BIGINTs FIRST, then the score evaluates once per source
    through ONE shared expression string — never an average of per-doc
    doubles (order-free by construction). The readability axis of the
    text-quality family (unigram logprob, repetition, lang-id).

    Scale: one documents scan with three regexp counts, one source
    aggregate."""
    d = load_testdata(spark, sf_dir, tables=("documents",), register=False)[
        "documents"
    ]
    words = "size(regexp_extract_all(text, '[A-Za-z]+', 0))"
    sents = "GREATEST(size(regexp_extract_all(text, '[.!?]+', 0)), 1)"
    syll = "size(regexp_extract_all(text, '[aeiouAEIOUyY]+', 0))"
    agg = (
        d.select(
            "source",
            F.expr(words).cast("long").alias("w"),
            F.expr(sents).cast("long").alias("s"),
            F.expr(syll).cast("long").alias("y"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("w").cast("long").alias("words"),
            F.sum("s").cast("long").alias("sentences"),
            F.sum("y").cast("long").alias("syllables"),
        )
    )
    return agg.select(
        "source",
        "n_docs",
        "words",
        "sentences",
        "syllables",
        F.expr(_FLESCH).alias("flesch"),
    ).orderBy("source")


QUERIES = {
    "t30_markov_attribution": markov_attribution,
    "t30_price_elasticity": price_elasticity,
    "t30_simpson_paradox": simpson_paradox_detector,
    "t30_flesch_by_source": flesch_by_source,
}

_TOUCH_LIST = ", ".join(f"'{t}'" for t in _TOUCHES)

# Unrolled propagation rounds over the variant-expanded edge table.
_MK_CTE_ROUNDS = ",".join(
    f"""
    v{r} AS (
        SELECT v.variant, e.dst AS state,
               CAST(SUM((v.mass * e.p) // {_MICRO}) AS BIGINT) AS mass
        FROM v{r - 1} v JOIN vedges e
          ON e.variant = v.variant AND e.src = v.state
        GROUP BY 1, 2
    )"""
    for r in range(1, _MK_ROUNDS + 1)
)

ORACLE = {
    "t30_markov_attribution": f"""
        WITH base AS (
            SELECT user_id, event_type, epoch_us(ts) AS us, event_id
            FROM events
        ),
        first_p AS (
            SELECT user_id, MIN(us) AS p_us FROM base
            WHERE event_type = 'purchase' GROUP BY 1
        ),
        touches AS (
            SELECT b.user_id, b.event_type, b.us, b.event_id,
                   f.p_us IS NOT NULL AS conv
            FROM base b LEFT JOIN first_p f USING (user_id)
            WHERE b.event_type <> 'purchase'
              AND (f.p_us IS NULL OR b.us < f.p_us)
        ),
        seq AS (
            SELECT user_id, event_type, conv,
                   row_number() OVER w AS rn,
                   lead(event_type) OVER w AS nxt
            FROM touches
            WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        ),
        raw_edges AS (
            SELECT event_type AS src,
                   COALESCE(nxt, CASE WHEN conv THEN 'conv' ELSE 'null' END)
                       AS dst
            FROM seq
            UNION ALL
            SELECT 'start', event_type FROM seq WHERE rn = 1
            UNION ALL
            SELECT 'start',
                   CASE WHEN f.p_us IS NOT NULL THEN 'conv' ELSE 'null' END
            FROM (SELECT DISTINCT user_id FROM base) u
            LEFT JOIN first_p f USING (user_id)
            WHERE user_id NOT IN (SELECT user_id FROM seq WHERE rn = 1)
        ),
        counts AS (
            SELECT src, dst, COUNT(*) AS c FROM raw_edges GROUP BY 1, 2
        ),
        p AS (
            SELECT src, dst,
                   ({_MICRO} * c) // SUM(c) OVER (PARTITION BY src) AS p
            FROM counts
            UNION ALL SELECT 'conv', 'conv', {_MICRO}
            UNION ALL SELECT 'null', 'null', {_MICRO}
        ),
        variants AS (
            SELECT UNNEST(['base', {_TOUCH_LIST}]) AS variant
        ),
        vedges AS (
            SELECT variant, src,
                   CASE WHEN variant <> 'base' AND dst = variant
                        THEN 'null' ELSE dst END AS dst,
                   CAST(SUM(p) AS BIGINT) AS p
            FROM p CROSS JOIN variants
            WHERE variant = 'base' OR src <> variant
            GROUP BY 1, 2, 3
        ),
        v0 AS (
            SELECT variant, 'start' AS state,
                   CAST({_MICRO} AS BIGINT) AS mass
            FROM variants
        ),{_MK_CTE_ROUNDS},
        conv AS (
            SELECT variant, mass AS conv_micro FROM v{_MK_ROUNDS}
            WHERE state = 'conv'
        ),
        rem AS (
            SELECT c.variant AS channel,
                   b.conv_micro AS base_micro,
                   c.conv_micro,
                   b.conv_micro - c.conv_micro AS removal_micro
            FROM conv c
            CROSS JOIN (SELECT conv_micro FROM conv WHERE variant = 'base') b
            WHERE c.variant <> 'base'
        )
        SELECT channel, base_micro, conv_micro, removal_micro,
               CAST(removal_micro AS DOUBLE)
                   / CAST((SELECT SUM(removal_micro) FROM rem) AS DOUBLE)
                   AS share
        FROM rem ORDER BY channel
    """,
    "t30_price_elasticity": f"""
        WITH base AS (
            SELECT p_brand,
                   CAST(floor(1000000.0 * ln(CAST(
                       CAST(floor(l_extendedprice * 100 / l_quantity)
                            AS BIGINT) AS DOUBLE))) AS BIGINT) AS x,
                   CAST(floor(1000000.0 * ln(CAST(l_quantity AS DOUBLE)))
                        AS BIGINT) AS y
            FROM lineitem JOIN part ON l_partkey = p_partkey
        ),
        agg AS (
            SELECT p_brand,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx
            FROM base GROUP BY 1
        )
        SELECT p_brand, n, {_ELASTICITY} AS elasticity
        FROM agg ORDER BY p_brand
    """,
    "t30_simpson_paradox": """
        WITH base AS (
            SELECT event_type,
                   CAST(hour(ts) AS BIGINT) AS x,
                   CAST(round(value * 100, 0) AS BIGINT) AS y
            FROM events
        ),
        per AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS BIGINT)
                       AS slope_num
            FROM base GROUP BY 1
        ),
        pooled AS (
            SELECT CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS BIGINT)
                       AS pooled_num
            FROM base
        )
        SELECT event_type, n, slope_num, pooled_num,
               sign(slope_num) * sign(pooled_num) < 0 AS reversed
        FROM per CROSS JOIN pooled ORDER BY event_type
    """,
    "t30_flesch_by_source": f"""
        WITH counts AS (
            SELECT source,
                   CAST(len(regexp_extract_all(text, '[A-Za-z]+'))
                        AS BIGINT) AS w,
                   CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
                        AS BIGINT) AS s,
                   CAST(len(regexp_extract_all(text, '[aeiouAEIOUyY]+'))
                        AS BIGINT) AS y
            FROM documents
        ),
        agg AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(w) AS BIGINT) AS words,
                   CAST(SUM(s) AS BIGINT) AS sentences,
                   CAST(SUM(y) AS BIGINT) AS syllables
            FROM counts GROUP BY 1
        )
        SELECT source, n_docs, words, sentences, syllables,
               {_FLESCH} AS flesch
        FROM agg ORDER BY source
    """,
}
