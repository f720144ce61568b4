"""Distinctive-vocabulary / model-validation / identity-resolution
pack (T36): Monroe-style log-odds-ratio distinctive terms per source
(with a Dirichlet prior, in floored micro-nats), k-fold
cross-validation of the integer GD classifier (t33) with held-out
Brier scores, network-based identity stitching over shared /16 IP
blocks (the cross-device counterpart of the t25 golden-record merge),
and two-level binary-segmentation changepoints over daily revenue
(the recursive extension of the t26 CUSUM).

Reference anchors (SURVEY §2): the reference stores ip_address on
every Redis user hash (`redis_client.py:74-93`) and never joins on
it — identity stitching is what that column is FOR; log-odds prices
the documents fixture's sources the way chi2/tf-idf (ext pack)
only rank; CV generalizes the engine's train/eval story from one fit
to a variance estimate.

Scale notes (100 TB):
- log-odds: two (term, source) count grids -> per-term BIGINT
  arithmetic; the prior keeps zero cells finite without smoothing
  doubles.
- CV: each fold reuses the t33 epoch = one-scan-per-gradient shape,
  filtered by the SAME Knuth-hash fold id on both engines; held-out
  Brier is an exact integer.
- stitching: /16 block key -> per-block pair fan-out (blocks are
  tiny) -> star-contraction components.
- changepoints: the day series splits at the CUSUM argmax, then each
  half re-runs the same exact integer statistic — 2 unrolled levels.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.operators.cluster import assign_clusters
from bigdatamanagement_spark.operators.text import tokens
from bigdatamanagement_spark.operators.traindata import KNUTH
from bigdatamanagement_spark.queries.analytics15 import _SIG

_LOGODDS_TOP_K = 10
_LOGODDS_PRIOR = 1  # Dirichlet pseudo-count per (term, class)
_CV_FOLDS = 3
_CV_EPOCHS = 3
_CV_LR_SHIFT = 4


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


def distinctive_terms_logodds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T36a — distinctive vocabulary per document source via the
    log-odds ratio with a Dirichlet prior (Monroe, Colaresi & Quinn
    2008, the additive-smoothing form): for each (source, term),
    delta = ln((c_s + a) / (N_s + A - c_s - a)) - ln((c_r + a) /
    (N_r + A - c_r - a)) against the rest of the corpus, each log
    floored to exact micro-nats so ranking is BIGINT arithmetic;
    top-10 per source by (delta desc, term asc) among terms with
    >= 5 corpus occurrences. The "what words make this source ITSELF"
    readout that raw tf-idf and chi2 (ext pack) only approximate.

    Scale: one token scan -> one (term, source) grid + a broadcast
    per-source total row; per-term arithmetic only."""
    d = load_testdata(spark, sf_dir, tables=("documents",), register=False)[
        "documents"
    ]
    tok = d.select("source", F.explode(tokens(F.col("text"))).alias("term"))
    grid = tok.groupBy("term", "source").agg(
        F.count(F.lit(1)).alias("c")
    )
    term_tot = grid.groupBy("term").agg(F.sum("c").alias("c_all"))
    src_tot = grid.groupBy("source").agg(F.sum("c").alias("n_s"))
    corpus = src_tot.agg(
        F.sum("n_s").alias("n_all"), F.count(F.lit(1)).alias("k_src")
    )
    vocab = term_tot.agg(F.count(F.lit(1)).alias("v"))
    a = _LOGODDS_PRIOR
    base = (
        grid.join(term_tot, "term")
        .filter(F.col("c_all") >= 5)
        .join(F.broadcast(src_tot), "source")
        .join(F.broadcast(corpus))
        .join(F.broadcast(vocab))
        .select(
            "source",
            "term",
            "c",
            "c_all",
            "n_s",
            (F.col("n_all") - F.col("n_s")).alias("n_r"),
            (F.col("c_all") - F.col("c")).alias("c_r"),
            (F.col("v") * a).alias("big_a"),
        )
    )
    lo = (
        f"CAST(floor(1000000.0 * (ln(CAST(c + {a} AS DOUBLE)"
        f" / CAST(n_s + big_a - c - {a} AS DOUBLE))"
        f" - ln(CAST(c_r + {a} AS DOUBLE)"
        f" / CAST(n_r + big_a - c_r - {a} AS DOUBLE)))) AS BIGINT)"
    )
    scored = base.select(
        "source", "term", "c", F.expr(lo).alias("logodds_micro")
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("logodds_micro"), F.asc("term")
    )
    return (
        scored.select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _LOGODDS_TOP_K)
        .select("source", "term", F.col("c").cast("long").alias("c"),
                "logodds_micro", F.col("rn").cast("long").alias("rn"))
        .orderBy("source", "rn")
    )


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // b
    return -q if a < 0 else q


def cv_classifier_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T36b — 3-fold cross-validation of the integer hard-sigmoid GD
    classifier (t33): fold id = (event_id * KNUTH) % 3 (the traindata
    determinism discipline); each fold trains 3 epochs on the OTHER
    folds and reports its held-out exact integer Brier score and
    per-event average — the variance readout a single fit (t33)
    cannot give. Weights and scores are engine-independent integers.

    Scale: per fold x epoch = ONE filtered scan -> three gradient
    sums; 9 aggregates total over a checkpointed feature frame."""
    ev = _events(spark, sf_dir)
    feats = ev.select(
        F.when(F.col("event_type") == "purchase", 1_000_000)
        .otherwise(0)
        .cast("long")
        .alias("y"),
        F.hour("ts").cast("long").alias("x1"),
        F.expr("CAST(floor(value / 100) AS BIGINT)").alias("x2"),
        F.expr(f"(event_id * {KNUTH}) % {_CV_FOLDS}").alias("fold"),
    ).localCheckpoint()
    rows = []
    for fold in range(_CV_FOLDS):
        train = feats.filter(F.col("fold") != fold)
        w0 = w1 = w2 = 0
        for _ in range(_CV_EPOCHS):
            z = f"({w0} + {w1} * x1 + {w2} * x2)"
            sig = _SIG.replace("(z)", z)
            r = train.agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(F.expr(f"{sig} - y")).cast("long").alias("g0"),
                F.sum(F.expr(f"({sig} - y) * x1")).cast("long").alias("g1"),
                F.sum(F.expr(f"({sig} - y) * x2")).cast("long").alias("g2"),
            ).collect()[0]
            w0 -= _tdiv(_tdiv(r["g0"], r["n"]), 2**_CV_LR_SHIFT)
            w1 -= _tdiv(_tdiv(r["g1"], r["n"]), 2**_CV_LR_SHIFT)
            w2 -= _tdiv(_tdiv(r["g2"], r["n"]), 2**_CV_LR_SHIFT)
        z = f"({w0} + {w1} * x1 + {w2} * x2)"
        sig = _SIG.replace("(z)", z)
        held = feats.filter(F.col("fold") == fold).agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(F.expr(f"(({sig} - y) * ({sig} - y)) DIV 1000000"))
            .cast("long")
            .alias("brier_micro"),
        ).collect()[0]
        rows.append(
            (fold, w0, w1, w2, held["n_test"], held["brier_micro"])
        )
    return spark.createDataFrame(
        rows,
        "fold long, w0 long, w1 long, w2 long, n_test long,"
        " brier_micro long",
    ).orderBy("fold")


def ip_identity_stitching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T36c — network-based identity stitching: users sharing a /16 IP
    block (the household/corporate-network heuristic every
    cross-device identity graph starts from) stitch into one identity
    via star-contraction components; reports total users, stitched
    identities, multi-user identity count, largest identity, and the
    user checksum — the KV-store counterpart of the t25 golden-record
    merge (which stitched the SQL store by name instead).

    Scale: the block key bounds pair fan-out per block; components
    contract in O(log n) rounds; one summary row."""
    from bigdatamanagement_spark.queries.analytics9 import _users

    u = _users(spark).select(
        "user_key",
        F.regexp_extract(F.col("ip_address"), r"^(\d+\.\d+)\.", 1).alias(
            "block"
        ),
    )
    a = u.select(F.col("block"), F.col("user_key").alias("ua"))
    b = u.select(F.col("block"), F.col("user_key").alias("ub"))
    pairs = (
        a.join(b, "block")
        .filter(F.col("ua") < F.col("ub"))
        .select(F.col("ua").alias("pa"), F.col("ub").alias("pb"))
    )
    # user_key is a string ("user:123") — cluster on a numeric id
    ids = u.select(
        "user_key",
        F.expr("CAST(split(user_key, ':')[1] AS BIGINT)").alias("uid"),
    )
    pairs_n = (
        pairs.join(
            ids.select(F.col("user_key").alias("pa"), F.col("uid").alias("na")),
            "pa",
        )
        .join(
            ids.select(F.col("user_key").alias("pb"), F.col("uid").alias("nb")),
            "pb",
        )
        .select("na", "nb")
    )
    clustered = assign_clusters(ids, "uid", pairs_n, "na", "nb")
    sizes = clustered.groupBy("cluster_rep").agg(
        F.count(F.lit(1)).alias("sz")
    )
    return sizes.agg(
        F.sum("sz").cast("long").alias("n_users"),
        F.count(F.lit(1)).cast("long").alias("n_identities"),
        F.sum(F.when(F.col("sz") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("n_stitched_groups"),
        F.max("sz").cast("long").alias("largest_identity"),
        F.sum(F.col("cluster_rep") * F.col("sz"))
        .cast("long")
        .alias("identity_checksum"),
    )


def binary_segmentation_changepoints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """T36d — two-level binary segmentation of daily purchase revenue:
    level 1 finds the global CUSUM argmax day (exactly t26's
    statistic); the series then splits there and each half re-runs the
    same exact integer statistic (n*S_t = n*P_t - t*T per segment) —
    three ranked changepoint candidates with their segment-local peak
    heights, the recursive step every changepoint library (ruptures'
    binseg) takes. All integers; earliest-day tiebreaks.

    Scale: the day series is tiny after one aggregate; each level is
    a window pass over its segment."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.expr("CAST(round(value * 100, 0) AS BIGINT)")).alias("x")
    )
    # One aggregate job collects the day-grain series (bounded by
    # calendar days — the same cardinality the former partition-less
    # windows already funneled into one task); the two-level recursion
    # then runs driver-side with the identical exact-integer statistic
    # instead of ~8 sequential tiny Spark jobs (3 window+argmax waves +
    # per-level collects) — measured 2.4-3.3 s -> ~1 s.
    series = sorted(
        ((r["day"], int(r["x"])) for r in daily.collect()), key=lambda t: t[0]
    )

    def peak(seg: list) -> tuple:
        n, t = len(seg), sum(x for _, x in seg)
        best = None  # (abs_ns, day) with earliest-day tiebreak on max
        p = 0
        for i, (day, x) in enumerate(seg, start=1):
            p += x
            abs_ns = abs(n * p - i * t)
            if best is None or abs_ns > best[0]:
                best = (abs_ns, day)
        return (best[1], best[0], n)  # (cp_day, peak_ns, seg_days)

    cp1, peak1, n1 = peak(series)
    rows = [(1, cp1, peak1, n1)]
    left = [s for s in series if s[0] <= cp1]
    right = [s for s in series if s[0] > cp1]
    for label, seg in ((2, left), (3, right)):
        if len(seg) >= 3:
            cp, pk, n = peak(seg)
            rows.append((label, cp, pk, n))
    return spark.createDataFrame(
        rows, "level long, cp_day date, peak_ns long, seg_days long"
    ).orderBy("level")


QUERIES = {
    "t36_distinctive_terms_logodds": distinctive_terms_logodds,
    "t36_cv_classifier_folds": cv_classifier_folds,
    "t36_ip_identity_stitching": ip_identity_stitching,
    "t36_binseg_changepoints": binary_segmentation_changepoints,
}


def _cv_oracle() -> str:
    """Unrolled folds x epochs, mirroring the scalar-CTE style of the
    t33 oracle with a fold filter."""
    parts = [
        f"""base AS (
            SELECT CASE WHEN event_type = 'purchase'
                   THEN 1000000 ELSE 0 END AS y,
                   CAST(hour(ts) AS BIGINT) AS x1,
                   CAST(floor(value / 100) AS BIGINT) AS x2,
                   (event_id * {KNUTH}) % {_CV_FOLDS} AS fold
            FROM events
        )"""
    ]
    selects = []
    for f in range(_CV_FOLDS):
        parts.append(
            f"f{f}w0 AS (SELECT CAST(0 AS BIGINT) AS w0,"
            " CAST(0 AS BIGINT) AS w1, CAST(0 AS BIGINT) AS w2)"
        )
        for ep in range(1, _CV_EPOCHS + 1):
            sig = (
                "LEAST(GREATEST(500000 + (w.w0 + w.w1 * b.x1"
                " + w.w2 * b.x2) // 4, 0), 1000000)"
            )
            parts.append(
                f"""f{f}g{ep} AS (
                SELECT CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM({sig} - b.y) AS BIGINT) AS g0,
                       CAST(SUM(({sig} - b.y) * b.x1) AS BIGINT) AS g1,
                       CAST(SUM(({sig} - b.y) * b.x2) AS BIGINT) AS g2
                FROM base b CROSS JOIN f{f}w{ep - 1} w
                WHERE b.fold <> {f}
            )"""
            )
            parts.append(
                f"""f{f}w{ep} AS (
                SELECT w.w0 - (g.g0 // g.n) // {2 ** _CV_LR_SHIFT} AS w0,
                       w.w1 - (g.g1 // g.n) // {2 ** _CV_LR_SHIFT} AS w1,
                       w.w2 - (g.g2 // g.n) // {2 ** _CV_LR_SHIFT} AS w2
                FROM f{f}w{ep - 1} w CROSS JOIN f{f}g{ep} g
            )"""
            )
        sig_final = (
            "LEAST(GREATEST(500000 + (w.w0 + w.w1 * b.x1"
            " + w.w2 * b.x2) // 4, 0), 1000000)"
        )
        selects.append(
            f"""SELECT CAST({f} AS BIGINT) AS fold, w.w0, w.w1, w.w2,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM base b
                    WHERE b.fold = {f}) AS n_test,
                   (SELECT CAST(SUM((({sig_final}) - b.y)
                        * (({sig_final}) - b.y) // 1000000) AS BIGINT)
                    FROM base b WHERE b.fold = {f}) AS brier_micro
            FROM f{f}w{_CV_EPOCHS} w"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + " "
        + " UNION ALL ".join(selects)
        + " ORDER BY fold"
    )


ORACLE = {
    "t36_distinctive_terms_logodds": f"""
        WITH tok AS (
            SELECT source,
                   UNNEST(regexp_split_to_array(lower(trim(text)), '\\s+'))
                       AS term
            FROM documents
        ),
        grid AS (
            SELECT term, source, COUNT(*) AS c FROM tok GROUP BY 1, 2
        ),
        term_tot AS (SELECT term, SUM(c) AS c_all FROM grid GROUP BY 1),
        src_tot AS (SELECT source, SUM(c) AS n_s FROM grid GROUP BY 1),
        corpus AS (SELECT SUM(n_s) AS n_all FROM src_tot),
        vocab AS (SELECT COUNT(*) AS v FROM term_tot),
        base AS (
            SELECT g.source, g.term, g.c, t.c_all, s.n_s,
                   corpus.n_all - s.n_s AS n_r,
                   t.c_all - g.c AS c_r,
                   vocab.v * {_LOGODDS_PRIOR} AS big_a
            FROM grid g
            JOIN term_tot t USING (term)
            JOIN src_tot s USING (source)
            CROSS JOIN corpus CROSS JOIN vocab
            WHERE t.c_all >= 5
        ),
        scored AS (
            SELECT source, term, CAST(c AS BIGINT) AS c,
                   CAST(floor(1000000.0 * (
                       ln(CAST(c + {_LOGODDS_PRIOR} AS DOUBLE)
                          / CAST(n_s + big_a - c - {_LOGODDS_PRIOR}
                                 AS DOUBLE))
                       - ln(CAST(c_r + {_LOGODDS_PRIOR} AS DOUBLE)
                          / CAST(n_r + big_a - c_r - {_LOGODDS_PRIOR}
                                 AS DOUBLE)))) AS BIGINT) AS logodds_micro
            FROM base
        )
        SELECT source, term, c, logodds_micro, CAST(rn AS BIGINT) AS rn
        FROM (
            SELECT *, row_number() OVER (PARTITION BY source
                       ORDER BY logodds_micro DESC, term ASC) AS rn
            FROM scored
        ) WHERE rn <= {_LOGODDS_TOP_K}
        ORDER BY source, rn
    """,
    "t36_cv_classifier_folds": _cv_oracle(),
}


def _stitch_oracle() -> str:
    from bigdatamanagement_spark.queries.analytics9 import _users_view

    return f"""
        {_users_view().replace("WITH ", "WITH RECURSIVE ", 1)},
        ids AS (
            SELECT user_key,
                   CAST(split_part(user_key, ':', 2) AS BIGINT) AS uid,
                   regexp_extract(ip_address, '^(\\d+\\.\\d+)\\.', 1)
                       AS block
            FROM users
        ),
        pairs AS (
            SELECT a.uid AS pa, b.uid AS pb
            FROM ids a JOIN ids b
              ON a.block = b.block AND a.uid < b.uid
        ),
        edges AS (
            SELECT pa AS u, pb AS v FROM pairs
            UNION SELECT pb, pa FROM pairs
        ),
        reach(n, r) AS (
            SELECT uid, uid FROM ids
            UNION
            SELECT e.u, reach.r FROM edges e JOIN reach ON reach.n = e.v
        ),
        comp AS (SELECT n AS uid, MIN(r) AS rep FROM reach GROUP BY n),
        sizes AS (SELECT rep, COUNT(*) AS sz FROM comp GROUP BY 1)
        SELECT CAST(SUM(sz) AS BIGINT) AS n_users,
               CAST(COUNT(*) AS BIGINT) AS n_identities,
               CAST(SUM(CASE WHEN sz >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_stitched_groups,
               CAST(MAX(sz) AS BIGINT) AS largest_identity,
               CAST(SUM(rep * sz) AS BIGINT) AS identity_checksum
        FROM sizes
    """


ORACLE["t36_ip_identity_stitching"] = _stitch_oracle()

ORACLE["t36_binseg_changepoints"] = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               SUM(CAST(round(value * 100, 0) AS BIGINT)) AS x
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ),
    lvl AS (
        SELECT day, x,
               SUM(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS p,
               CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
               CAST(COUNT(*) OVER () AS BIGINT) AS n,
               CAST(SUM(x) OVER () AS BIGINT) AS t
        FROM daily
    ),
    s1 AS (
        SELECT day, abs(n * p - i * t) AS abs_ns, n FROM lvl
    ),
    cp1 AS (
        SELECT day AS cp_day, abs_ns AS peak_ns, n AS seg_days
        FROM s1 ORDER BY abs_ns DESC, day ASC LIMIT 1
    ),
    seg2 AS (
        SELECT d.day, d.x FROM daily d CROSS JOIN cp1
        WHERE d.day <= cp1.cp_day
    ),
    seg3 AS (
        SELECT d.day, d.x FROM daily d CROSS JOIN cp1
        WHERE d.day > cp1.cp_day
    ),
    lvl2 AS (
        SELECT day,
               SUM(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS p,
               CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
               CAST(COUNT(*) OVER () AS BIGINT) AS n,
               CAST(SUM(x) OVER () AS BIGINT) AS t
        FROM seg2
    ),
    lvl3 AS (
        SELECT day,
               SUM(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS p,
               CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
               CAST(COUNT(*) OVER () AS BIGINT) AS n,
               CAST(SUM(x) OVER () AS BIGINT) AS t
        FROM seg3
    ),
    c2 AS (
        SELECT CAST(2 AS BIGINT) AS level, day AS cp_day,
               CAST(abs(n * p - i * t) AS BIGINT) AS peak_ns,
               n AS seg_days
        FROM lvl2 WHERE n >= 3
        ORDER BY abs(n * p - i * t) DESC, day ASC LIMIT 1
    ),
    c3 AS (
        SELECT CAST(3 AS BIGINT) AS level, day AS cp_day,
               CAST(abs(n * p - i * t) AS BIGINT) AS peak_ns,
               n AS seg_days
        FROM lvl3 WHERE n >= 3
        ORDER BY abs(n * p - i * t) DESC, day ASC LIMIT 1
    )
    SELECT CAST(1 AS BIGINT) AS level, cp_day,
           CAST(peak_ns AS BIGINT) AS peak_ns, seg_days
    FROM cp1
    UNION ALL SELECT * FROM c2
    UNION ALL SELECT * FROM c3
    ORDER BY level
"""
