"""Decayed-leaderboard / session-sensitivity / price-dispersion /
cross-source-dup pack (T52): an exponentially time-decayed part
leaderboard with EXACT dyadic week weights (the trending score
product surfaces ship, next to the raw all-time rank it corrects),
a sessionization gap-threshold sensitivity sweep (session counts at
5m/30m/2h from ONE lag pass — the knob audit for every session-grain
query in the engine), a unit-price dispersion audit (same part, same
table, different effective prices — the pricing-consistency screen),
and the cross-source duplicate-prefix matrix (shared document
openings across sources — the boilerplate/contamination readout a
training-data pipeline checks before mixing).

Reference anchors (SURVEY §2): the decayed leaderboard upgrades the
Redis sorted-set top-k (Q-W03, `redis_client.py:443`) with the decay
real leaderboards use; the sweep audits the 30-min convention every
t18/t21/t23 session query inherits; price dispersion reads the
lineitem money columns of the T02 spend aggregate; the dup matrix is
the source-pair face of ext_dedup_exact_groups.

Scale notes (100 TB):
- leaderboard: one (part, week) aggregate; weights are dyadic shifts
  (qty << (20 − age), age capped — exact BIGINT at any SF); top-k is
  a bounded rank window.
- sweep: ONE user-keyed lag pass; all three thresholds fold as
  conditional sums over the same gap column (n_sessions(T) =
  n_users + #gaps > T — no per-threshold re-sessionization).
- dispersion: unit price floors to whole dollars once (documented);
  per-part exact moments; the milli-(1+CV²) ranking key is pure
  integer.
- dup matrix: one fingerprint-keyed aggregate; the source-pair
  fan-out is bounded by each fingerprint's distinct-source set.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata

_MICRO = 1_000_000
_DECAY_CAP = 20  # max week age carrying weight 2^(20-age); older = weight 1
_GAPS = (("5m", 300), ("30m", 1800), ("2h", 7200))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


# --- T52a: dyadic time-decayed leaderboard --------------------------------------


def decayed_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T52a — time-decayed part leaderboard: score = Σ weekly_qty ·
    2^(CAP − age) with age = weeks since that week (capped at 20, so
    every weight is an exact dyadic BIGINT shift — half-life of one
    week, the trending convention). Top-10 by (decayed score desc,
    part asc), with the UNDECAYED total quantity alongside so rank
    inversions — a part that sold a lot long ago vs one selling now —
    are visible in the output. The decay upgrade of the reference's
    ZREVRANGE leaderboard (`redis_client.py:443`).

    Scale: one (part, week) aggregate; the decay is a projection;
    top-k is orderBy+limit (TakeOrderedAndProject — per-partition
    heaps), with the rank window running on the <= 10 survivors
    only."""
    li = load_testdata(spark, sf_dir, tables=("lineitem",), register=False)[
        "lineitem"
    ]
    weekly = li.groupBy(
        F.col("l_partkey").alias("part"),
        F.expr("CAST(weekofyear(l_shipdate) AS BIGINT)").alias("wk"),
    ).agg(F.expr("CAST(SUM(l_quantity) AS BIGINT)").alias("q"))
    lw = weekly.agg(F.max("wk").alias("lw"))
    scored = (
        weekly.join(F.broadcast(lw))
        .groupBy("part")
        .agg(
            F.sum(
                F.expr(
                    f"q * shiftleft(CAST(1 AS BIGINT),"
                    f" CAST({_DECAY_CAP} - least(lw - wk, {_DECAY_CAP})"
                    f" AS INT))"
                )
            )
            .cast("long")
            .alias("decayed_score"),
            F.sum("q").cast("long").alias("total_qty"),
        )
    )
    top = scored.orderBy(F.desc("decayed_score"), F.asc("part")).limit(10)
    w = Window.orderBy(F.desc("decayed_score"), F.asc("part"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select(
            "rank",
            F.col("part").alias("p_partkey"),
            "decayed_score",
            "total_qty",
        )
        .orderBy("rank")
    )


# --- T52b: sessionization gap-threshold sensitivity ------------------------------


def session_gap_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T52b — sensitivity of sessionization to the inactivity gap:
    session counts at 5m/30m/2h thresholds from ONE user-keyed lag
    pass — n_sessions(T) = n_users + #{consecutive-event gaps > T},
    so the sweep is three conditional sums over the same gap column,
    not three re-sessionizations. Reported with mean events/session
    (micro). The knob audit behind every session-grain query in the
    engine: if the metric cliff-dives between 30m and 2h, the 30-min
    convention is doing real work.

    Scale: one user-keyed window; the sweep is one reduce."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (
            F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
            - F.lag(F.expr("unix_micros(CAST(ts AS TIMESTAMP))")).over(w)
        ).alias("gap_us"),
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
    ]
    for label, secs in _GAPS:
        aggs.append(
            F.sum(
                F.when(
                    F.col("gap_us")
                    > F.lit(secs).cast("long") * F.lit(_MICRO).cast("long"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias(f"brk_{label}")
        )
    row = gaps.agg(*aggs)
    outs = []
    for label, secs in _GAPS:
        outs.append(
            row.select(
                F.lit(label).alias("gap"),
                F.lit(secs).cast("long").alias("gap_seconds"),
                "n_events",
                F.expr(f"n_users + brk_{label}").alias("n_sessions"),
                F.expr(
                    f"(n_events * 1000000) DIV (n_users + brk_{label})"
                ).alias("events_per_session_micro"),
            )
        )
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    return out.orderBy("gap_seconds")


# --- T52c: unit-price dispersion audit ---------------------------------------------

_CV = (
    "(sqrt(greatest(CAST(n AS DOUBLE) * CAST(q AS DOUBLE)"
    " / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) - 1.0, 0.0)))"
)


def price_dispersion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T52c — unit-price dispersion per part: the same part sold at
    different effective unit prices (extendedprice/quantity) is
    either price discrimination or a data-quality bug; this ranks the
    top-10 most dispersed parts (≥5 sales) by the coefficient of
    variation. Unit price floors ONCE to whole dollars (documented
    grain — q = Σuc² then stays BIGINT-safe through ~sf500); the
    ranking key (q·1000) DIV (s² DIV n) — milli-(1+CV²) — is pure
    integer, so no ORDER BY ever touches a double; the CV itself is
    one shared expression.

    Scale: one (part) aggregate over a projection; top-k bounded."""
    li = load_testdata(spark, sf_dir, tables=("lineitem",), register=False)[
        "lineitem"
    ]
    uc = F.expr(
        "CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
        " DIV (CAST(l_quantity AS BIGINT) * 100)"
    )
    agg = (
        li.filter(F.expr("l_quantity > 0"))
        .select(F.col("l_partkey").alias("part"), uc.alias("uc"))
        .groupBy("part")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("uc").cast("long").alias("s"),
            F.sum(F.col("uc") * F.col("uc")).cast("long").alias("q"),
        )
        .filter((F.col("n") >= 5) & (F.col("s") > 0))
        .filter(F.expr("(s * s) DIV n > 0"))
    )
    key = F.expr("(q * 1000) DIV ((s * s) DIV n)")
    # top-k as orderBy+limit (TakeOrderedAndProject); rank only the
    # <= 10 survivors — never a global row_number window
    top = (
        agg.select("part", "n", "s", "q", key.alias("disp_key"))
        .orderBy(F.desc("disp_key"), F.asc("part"))
        .limit(10)
    )
    w = Window.orderBy(F.desc("disp_key"), F.asc("part"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select(
            "rank",
            F.col("part").alias("p_partkey"),
            "n",
            "disp_key",
            F.expr(_CV).alias("cv"),
        )
        .orderBy("rank")
    )


# --- T52d: cross-source exact-duplicate matrix ---------------------------------------


def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T52d — cross-source duplicate-PREFIX matrix: documents are
    fingerprinted by md5 of their first 100 characters (the
    boilerplate screen — shared openings across sources are exactly
    how template/benchmark contamination shows up in a crawl mix);
    for every source pair (a < b), the count of distinct fingerprints
    present in both. Within-source counts sit on the diagonal rows
    (a = b, fingerprints with ≥2 docs in that source). Full-text md5
    would be the stricter key, but the synthetic corpus has no exact
    dups below sf0.1 — the prefix key keeps the screen non-vacuous at
    every SF while matching how boilerplate actually manifests.

    Scale: one md5-keyed aggregate collecting each hash's distinct
    source set (≤|sources|); pair fan-out bounded by that set size."""
    d = load_testdata(
        spark, sf_dir, tables=("documents",), register=False
    )["documents"]
    hashed = d.select(
        F.md5(F.expr("substring(text, 1, 100)")).alias("h"), "source"
    )
    per_hs = hashed.groupBy("h", "source").agg(
        F.count(F.lit(1)).alias("c")
    )
    # off-diagonal: distinct texts shared by the pair
    pairs = (
        per_hs.alias("x")
        .join(per_hs.alias("y"), F.col("x.h") == F.col("y.h"))
        .filter(F.col("x.source") < F.col("y.source"))
        .groupBy(
            F.col("x.source").alias("source_a"),
            F.col("y.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared_texts"))
    )
    diag = (
        per_hs.filter(F.col("c") >= 2)
        .groupBy(F.col("source").alias("source_a"))
        .agg(F.count(F.lit(1)).cast("long").alias("shared_texts"))
        .select(
            "source_a",
            F.col("source_a").alias("source_b"),
            "shared_texts",
        )
    )
    return pairs.unionByName(diag).orderBy("source_a", "source_b")


QUERIES = {
    "t52_decayed_leaderboard": decayed_leaderboard,
    "t52_session_gap_sensitivity": session_gap_sensitivity,
    "t52_price_dispersion_audit": price_dispersion_audit,
    "t52_cross_source_dup_matrix": cross_source_dup_matrix,
}

_GAP_ONE = """
        SELECT '{label}' AS gap, CAST({secs} AS BIGINT) AS gap_seconds,
               n_events,
               n_users + brk_{label} AS n_sessions,
               (n_events * 1000000) // (n_users + brk_{label})
                   AS events_per_session_micro
        FROM row
"""

ORACLE = {
    "t52_decayed_leaderboard": f"""
        WITH weekly AS (
            SELECT l_partkey AS part,
                   CAST(weekofyear(l_shipdate) AS BIGINT) AS wk,
                   CAST(SUM(l_quantity) AS BIGINT) AS q
            FROM lineitem GROUP BY 1, 2
        ),
        lw AS (SELECT MAX(wk) AS lw FROM weekly),
        scored AS (
            SELECT part,
                   CAST(SUM(q * (CAST(1 AS BIGINT) <<
                       CAST({_DECAY_CAP} - least(lw - wk, {_DECAY_CAP})
                            AS INT))) AS BIGINT) AS decayed_score,
                   CAST(SUM(q) AS BIGINT) AS total_qty
            FROM weekly CROSS JOIN lw GROUP BY 1
        )
        SELECT CAST(row_number() OVER (ORDER BY decayed_score DESC,
                                       part ASC) AS BIGINT) AS rank,
               part AS p_partkey, decayed_score, total_qty
        FROM scored
        QUALIFY rank <= 10
        ORDER BY rank
    """,
    "t52_session_gap_sensitivity": f"""
        WITH gaps AS (
            SELECT user_id,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                       AS gap_us
            FROM events
        ),
        row AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
                   {", ".join(
                       f"CAST(SUM(CASE WHEN gap_us >"
                       f" CAST({secs} AS BIGINT) * 1000000"
                       f" THEN 1 ELSE 0 END) AS BIGINT) AS brk_{label}"
                       for label, secs in _GAPS
                   )}
            FROM gaps
        )
        {" UNION ALL ".join(
            _GAP_ONE.format(label=label, secs=secs)
            for label, secs in _GAPS
        )}
        ORDER BY gap_seconds
    """,
    "t52_price_dispersion_audit": f"""
        WITH agg AS (
            SELECT part, n, s, q FROM (
                SELECT l_partkey AS part,
                       CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(uc) AS BIGINT) AS s,
                       CAST(SUM(uc * uc) AS BIGINT) AS q
                FROM (
                    SELECT l_partkey,
                           CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                            // (CAST(l_quantity AS BIGINT) * 100) AS uc
                    FROM lineitem WHERE l_quantity > 0
                )
                GROUP BY 1
            )
            WHERE n >= 5 AND s > 0 AND (s * s) // n > 0
        )
        SELECT CAST(row_number() OVER (
                   ORDER BY (q * 1000) // ((s * s) // n) DESC, part ASC)
                   AS BIGINT) AS rank,
               part AS p_partkey, n,
               (q * 1000) // ((s * s) // n) AS disp_key,
               {_CV} AS cv
        FROM agg
        QUALIFY rank <= 10
        ORDER BY rank
    """,
    "t52_cross_source_dup_matrix": """
        WITH per_hs AS (
            SELECT md5(substring(text, 1, 100)) AS h, source,
                   COUNT(*) AS c
            FROM documents GROUP BY 1, 2
        ),
        pairs AS (
            SELECT x.source AS source_a, y.source AS source_b,
                   CAST(COUNT(*) AS BIGINT) AS shared_texts
            FROM per_hs x JOIN per_hs y ON x.h = y.h
            WHERE x.source < y.source
            GROUP BY 1, 2
        ),
        diag AS (
            SELECT source AS source_a, source AS source_b,
                   CAST(COUNT(*) AS BIGINT) AS shared_texts
            FROM per_hs WHERE c >= 2 GROUP BY 1, 2
        )
        SELECT * FROM pairs
        UNION ALL
        SELECT * FROM diag
        ORDER BY source_a, source_b
    """,
}
