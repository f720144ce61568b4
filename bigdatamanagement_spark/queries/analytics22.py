"""HDR-histogram / trend-detection / conformal / diversification pack
(T40): exponential-bucket (HDR-style) value histogram with a pure
integer log2 (a generated CASE ladder — no float log near bucket
boundaries), day-over-half trending rank movers, split-conformal
prediction intervals with the finite-sample guarantee (hash-split
calibration, exact residual order statistics), and maximal-marginal-
relevance (MMR) re-ranking of documents (bounded greedy rounds,
exact Jaccard diversity).

Reference anchors (SURVEY §2): HDR buckets are how the reference's
load-rate instrumentation (`AmazonRedshift.java:448-456`) should have
been summarized; trending movers operationalize its ORDER BY...LIMIT
leaderboards (`redis_client.py:443`) as a delta; conformal turns the
engine's predictors (per-type means, the GD model) into calibrated
intervals; MMR is the diversification step every search stack
(ext_bm25_search) runs after scoring.

Scale notes (100 TB):
- HDR: bucket id via a 40-branch integer CASE ladder (powers of two
  as literals) — exact, branch-predictable, no float ever.
- movers: two half-keyed rank windows over per-user counts; the join
  is on the (bounded) top-k union.
- conformal: calibration split by Knuth-hash parity (the traindata
  discipline); the radius is an exact ceil((n_cal+1)*(1-alpha))-th
  order statistic of integer |residuals|.
- MMR: 4 bounded greedy rounds over the top-20 candidate pool;
  relevance and Jaccard diversity are exact micro integers, argmax
  ties break on doc_id.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.operators.text import tokens
from bigdatamanagement_spark.operators.traindata import KNUTH

_HDR_MAX_POW = 40
_MOVER_TOP_K = 10
_CONF_ALPHA_PCT = 10  # 90% coverage
_MMR_POOL = 20
_MMR_PICKS = 5
_MICRO = 1_000_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


def _log2_case(col: str) -> str:
    """Pure-integer floor(log2(x)) for x >= 1 as a CASE ladder over
    power-of-two literals — no float log anywhere near a boundary."""
    branches = " ".join(
        f"WHEN {col} < {2 ** (p + 1)} THEN {p}"
        for p in range(_HDR_MAX_POW)
    )
    return f"(CASE {branches} ELSE {_HDR_MAX_POW} END)"


def hdr_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T40a — HDR-style exponential-bucket histogram of event value
    cents: bucket = floor(log2(x)) computed by a generated integer
    CASE ladder (power-of-two literals; x = 0 gets its own bucket
    -1), reporting per bucket the count, exact sum, and the bucket's
    [2^b, 2^(b+1)) bounds — the constant-relative-error summary every
    latency/size telemetry pipeline stores instead of raw quantiles.

    Scale: one scan, one bucket-keyed aggregate; the ladder is
    branch-predictable integer comparisons."""
    ev = _events(spark, sf_dir)
    x = "CAST(round(value * 100, 0) AS BIGINT)"
    bucket = (
        f"CASE WHEN {x} <= 0 THEN -1 ELSE {_log2_case(x)} END"
    )
    agg = ev.select(
        F.expr(bucket).cast("long").alias("bucket"),
        F.expr(x).alias("v"),
    ).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("v").cast("long").alias("sum_centi"),
    )
    return agg.select(
        "bucket",
        F.expr(
            "CASE WHEN bucket < 0 THEN 0 ELSE CAST(pow(2, bucket) AS BIGINT)"
            " END"
        ).alias("lo_centi"),
        F.expr(
            "CASE WHEN bucket < 0 THEN 0"
            " ELSE CAST(pow(2, bucket + 1) AS BIGINT) - 1 END"
        ).alias("hi_centi"),
        "cnt",
        "sum_centi",
    ).orderBy("bucket")


def trending_rank_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T40b — trending detection: users ranked by event count in each
    half of the history (t25 midpoint convention; ties by user id);
    the top-10 climbers by (rank improvement desc, user asc) among
    users active in BOTH halves — the "movers" readout behind every
    trending widget, built from two exact rank windows instead of a
    fragile score ratio.

    Scale: one (half, user) count aggregate + two rank windows; the
    mover join carries only per-user rank pairs."""
    ev = _events(spark, sf_dir)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    span = ev.agg(F.min(us).alias("lo"), F.max(us).alias("hi")).select(
        F.expr("(lo + hi) div 2").alias("mid_us")
    )
    counts = (
        ev.join(F.broadcast(span))
        .select(
            "user_id",
            F.when(us < F.col("mid_us"), 1).otherwise(2).alias("h"),
        )
        .groupBy("user_id", "h")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("h").orderBy(F.desc("c"), F.asc("user_id"))
    ranked = counts.select(
        "user_id", "h", F.row_number().over(w).cast("long").alias("rk")
    )
    r1 = ranked.filter(F.col("h") == 1).select(
        "user_id", F.col("rk").alias("rank_first")
    )
    r2 = ranked.filter(F.col("h") == 2).select(
        "user_id", F.col("rk").alias("rank_second")
    )
    return (
        r1.join(r2, "user_id")
        .select(
            "user_id",
            "rank_first",
            "rank_second",
            (F.col("rank_first") - F.col("rank_second")).alias("rank_gain"),
        )
        .orderBy(F.desc("rank_gain"), "user_id")
        .limit(_MOVER_TOP_K)
    )


def split_conformal_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T40c — split-conformal prediction intervals for event value by
    type: the TRAIN half (Knuth-hash parity of event_id — the
    traindata discipline) fits the predictor (per-type mean in exact
    floored centi); the CALIBRATION half's absolute residuals supply
    the radius as the EXACT ceil((n_cal + 1) * 0.9)-th order
    statistic — the distribution-free finite-sample >=90% coverage
    guarantee, per type. Everything integer; empirical coverage on
    the calibration half is reported for the test to pin.

    Scale: one hash-tag scan -> per-type train means (broadcast) ->
    one calibration rank window per type."""
    ev = _events(spark, sf_dir)
    base = ev.select(
        "event_type",
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("x"),
        F.expr(f"(event_id * {KNUTH}) % 2").alias("cal"),
    ).localCheckpoint()
    train = base.filter(F.col("cal") == 0)
    mean = train.groupBy("event_type").agg(
        F.expr("SUM(x) DIV COUNT(*)").alias("pred_centi")
    )
    calib = base.filter(F.col("cal") == 1).join(
        F.broadcast(mean), "event_type"
    )
    resid = calib.select(
        "event_type",
        F.abs(F.col("x") - F.col("pred_centi")).alias("r"),
        (F.abs(F.col("x") - F.col("pred_centi"))).alias("r2"),
    )
    w = Window.partitionBy("event_type").orderBy("r")
    ranked = resid.select(
        "event_type",
        "r",
        F.row_number().over(w).cast("long").alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .cast("long")
        .alias("n_cal"),
    )
    radius = ranked.filter(
        F.col("rk")
        == F.expr(
            f"CAST(ceil((n_cal + 1) * (100 - {_CONF_ALPHA_PCT}) / 100.0)"
            " AS BIGINT)"
        )
    ).groupBy("event_type").agg(
        F.max("n_cal").alias("n_cal"),
        F.min("r").cast("long").alias("radius_centi"),
    )
    cov = (
        resid.join(F.broadcast(radius.select("event_type", "radius_centi")), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("r") <= F.col("radius_centi"), 1).otherwise(0))
            .cast("long")
            .alias("n_covered"),
        )
    )
    return (
        radius.join(cov, "event_type")
        .join(mean, "event_type")
        .select(
            "event_type",
            "pred_centi",
            "n_cal",
            "radius_centi",
            "n_covered",
            F.expr(
                "CAST(n_covered AS DOUBLE) / CAST(n_cal AS DOUBLE)"
            ).alias("coverage"),
        )
        .orderBy("event_type")
    )


def mmr_diversified_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T40d — maximal-marginal-relevance diversification: from the 20
    longest documents (relevance = distinct-token count, exact), pick
    5 greedily by score = relevance_micro - max Jaccard-similarity
    micro to the already-picked set (equal-weight MMR; first pick =
    max relevance; ties -> min doc_id) — the post-scoring
    diversification every search/RAG stack runs so the top-k is not
    five copies of the same document. Jaccard on distinct-token sets
    in exact micro; 4 bounded greedy rounds.

    Scale: the pool is top-k bounded BEFORE any pairwise work; each
    round is one broadcast-join argmax over <=20 candidates."""
    d = load_testdata(spark, sf_dir, tables=("documents",), register=False)[
        "documents"
    ]
    toks = d.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    ).distinct()
    rel = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("rel")
    )
    pool = rel.orderBy(F.desc("rel"), "doc_id").limit(_MMR_POOL).localCheckpoint()
    ptoks = toks.join(pool.select("doc_id"), "doc_id", "left_semi").localCheckpoint()
    inter = (
        ptoks.alias("l")
        .join(ptoks.alias("r"), F.col("l.tok") == F.col("r.tok"))
        .filter(F.col("l.doc_id") != F.col("r.doc_id"))
        .groupBy(
            F.col("l.doc_id").alias("da"), F.col("r.doc_id").alias("db")
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sims = (
        inter.join(pool.select(F.col("doc_id").alias("da"), F.col("rel").alias("na")), "da")
        .join(pool.select(F.col("doc_id").alias("db"), F.col("rel").alias("nb")), "db")
        .select(
            "da",
            "db",
            F.expr(f"(i * {_MICRO}) DIV (na + nb - i)").alias("sim_micro"),
        )
    )
    # The greedy selection runs on the DRIVER over provably bounded
    # metadata — the pool is top-_MMR_POOL by construction (<=20 rows,
    # <=380 sims), and the former per-round Spark argmax paid a full
    # job wave (~0.4 s) per pick for microseconds of integer work.
    # Identical arithmetic: score = rel_micro - max sim to picked,
    # argmax ties by min doc_id.
    pool_rows = {
        int(r["doc_id"]): int(r["rel"]) * _MICRO for r in pool.collect()
    }
    sim_rows = [
        (int(r["da"]), int(r["db"]), int(r["sim_micro"]))
        for r in sims.collect()
    ]
    picked: list[tuple[int, int, int]] = []
    first = max(pool_rows.items(), key=lambda kv: (kv[1], -kv[0]))
    picked.append((1, first[0], first[1]))
    for step in range(2, _MMR_PICKS + 1):
        sel = {p[1] for p in picked}
        best: tuple[int, int] | None = None
        for doc_id, rel_micro in pool_rows.items():
            if doc_id in sel:
                continue
            max_sim = max(
                (s for da, db, s in sim_rows if da == doc_id and db in sel),
                default=0,
            )
            score = rel_micro - max_sim
            if best is None or (score, -doc_id) > (best[1], -best[0]):
                best = (doc_id, score)
        assert best is not None
        picked.append((step, best[0], best[1]))
    return spark.createDataFrame(
        picked, "pick long, doc_id long, mmr_score_micro long"
    ).orderBy("pick")


QUERIES = {
    "t40_hdr_value_histogram": hdr_value_histogram,
    "t40_trending_rank_movers": trending_rank_movers,
    "t40_split_conformal_intervals": split_conformal_intervals,
    "t40_mmr_diversified_docs": mmr_diversified_docs,
}


def _mmr_oracle() -> str:
    """Greedy MMR unrolled: pick1 = argmax rel; pick_k = argmax of
    rel_micro - max sim to picked, ties by doc_id."""
    head = f"""
        WITH toks AS (
            SELECT DISTINCT doc_id,
                   UNNEST(regexp_split_to_array(lower(trim(text)), '\\s+'))
                       AS tok
            FROM documents
        ),
        rel AS (SELECT doc_id, COUNT(*) AS rel FROM toks GROUP BY 1),
        pool AS (
            SELECT doc_id, rel FROM rel
            ORDER BY rel DESC, doc_id ASC LIMIT {_MMR_POOL}
        ),
        ptoks AS (
            SELECT t.doc_id, t.tok FROM toks t
            JOIN pool USING (doc_id)
        ),
        inter AS (
            SELECT l.doc_id AS da, r.doc_id AS db, COUNT(*) AS i
            FROM ptoks l JOIN ptoks r ON l.tok = r.tok
                 AND l.doc_id <> r.doc_id
            GROUP BY 1, 2
        ),
        sims AS (
            SELECT da, db, (i * {_MICRO}) // (pa.rel + pb.rel - i)
                       AS sim_micro
            FROM inter
            JOIN pool pa ON pa.doc_id = da
            JOIN pool pb ON pb.doc_id = db
        ),
        sp AS (SELECT doc_id, rel * {_MICRO} AS rel_micro FROM pool),
        p1 AS (
            SELECT CAST(1 AS BIGINT) AS pick, doc_id,
                   CAST(rel_micro AS BIGINT) AS score
            FROM sp ORDER BY rel_micro DESC, doc_id ASC LIMIT 1
        )"""
    steps = []
    for k in range(2, _MMR_PICKS + 1):
        prev = " UNION ALL ".join(f"SELECT doc_id FROM p{j}" for j in range(1, k))
        steps.append(
            f"""p{k} AS (
            SELECT CAST({k} AS BIGINT) AS pick, s.doc_id,
                   CAST(s.rel_micro - COALESCE(m.max_sim, 0) AS BIGINT)
                       AS score
            FROM sp s
            LEFT JOIN (
                SELECT da AS doc_id, MAX(sim_micro) AS max_sim
                FROM sims WHERE db IN ({prev})
                GROUP BY 1
            ) m ON m.doc_id = s.doc_id
            WHERE s.doc_id NOT IN ({prev})
            ORDER BY score DESC, s.doc_id ASC LIMIT 1
        )"""
        )
    unions = " UNION ALL ".join(
        f"SELECT pick, doc_id, score AS mmr_score_micro FROM p{k}"
        for k in range(1, _MMR_PICKS + 1)
    )
    return head + "," + ",".join(steps) + f" {unions} ORDER BY pick"


ORACLE = {
    "t40_hdr_value_histogram": f"""
        WITH base AS (
            SELECT CAST(round(value * 100, 0) AS BIGINT) AS v FROM events
        ),
        tagged AS (
            SELECT v,
                   CASE WHEN v <= 0 THEN -1 ELSE {_log2_case("v")} END
                       AS bucket
            FROM base
        )
        SELECT CAST(bucket AS BIGINT) AS bucket,
               CASE WHEN bucket < 0 THEN 0
                    ELSE CAST(pow(2, bucket) AS BIGINT) END AS lo_centi,
               CASE WHEN bucket < 0 THEN 0
                    ELSE CAST(pow(2, bucket + 1) AS BIGINT) - 1 END
                   AS hi_centi,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(v) AS BIGINT) AS sum_centi
        FROM tagged GROUP BY 1, 2, 3 ORDER BY 1
    """,
    "t40_trending_rank_movers": f"""
        WITH span AS (
            SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid_us
            FROM events
        ),
        counts AS (
            SELECT user_id,
                   CASE WHEN epoch_us(ts) < mid_us THEN 1 ELSE 2 END AS h,
                   COUNT(*) AS c
            FROM events CROSS JOIN span
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT user_id, h,
                   CAST(row_number() OVER (PARTITION BY h
                        ORDER BY c DESC, user_id ASC) AS BIGINT) AS rk
            FROM counts
        )
        SELECT r1.user_id,
               r1.rk AS rank_first, r2.rk AS rank_second,
               r1.rk - r2.rk AS rank_gain
        FROM ranked r1 JOIN ranked r2
          ON r1.user_id = r2.user_id AND r1.h = 1 AND r2.h = 2
        ORDER BY rank_gain DESC, r1.user_id ASC LIMIT {_MOVER_TOP_K}
    """,
    "t40_split_conformal_intervals": f"""
        WITH base AS (
            SELECT event_type,
                   CAST(round(value * 100, 0) AS BIGINT) AS x,
                   (event_id * {KNUTH}) % 2 AS cal
            FROM events
        ),
        mean AS (
            SELECT event_type, SUM(x) // COUNT(*) AS pred_centi
            FROM base WHERE cal = 0 GROUP BY 1
        ),
        resid AS (
            SELECT b.event_type, abs(b.x - m.pred_centi) AS r
            FROM base b JOIN mean m USING (event_type)
            WHERE b.cal = 1
        ),
        ranked AS (
            SELECT event_type, r,
                   CAST(row_number() OVER (PARTITION BY event_type
                        ORDER BY r) AS BIGINT) AS rk,
                   CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                       AS n_cal
            FROM resid
        ),
        radius AS (
            SELECT event_type, MAX(n_cal) AS n_cal,
                   CAST(MIN(r) AS BIGINT) AS radius_centi
            FROM ranked
            WHERE rk = CAST(ceil((n_cal + 1)
                       * (100 - {_CONF_ALPHA_PCT}) / 100.0) AS BIGINT)
            GROUP BY 1
        ),
        cov AS (
            SELECT rr.event_type,
                   CAST(SUM(CASE WHEN rr.r <= ra.radius_centi THEN 1
                        ELSE 0 END) AS BIGINT) AS n_covered
            FROM resid rr JOIN radius ra USING (event_type)
            GROUP BY 1
        )
        SELECT r.event_type, m.pred_centi, r.n_cal, r.radius_centi,
               c.n_covered,
               CAST(c.n_covered AS DOUBLE) / CAST(r.n_cal AS DOUBLE)
                   AS coverage
        FROM radius r JOIN cov c USING (event_type)
        JOIN mean m USING (event_type)
        ORDER BY r.event_type
    """,
    "t40_mmr_diversified_docs": _mmr_oracle(),
}
