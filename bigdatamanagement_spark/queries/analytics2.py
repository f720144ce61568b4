"""Advanced-analytics pack 2 (T19/ext): information-theoretic corpus
stats (per-source Shannon entropy), robust anomaly screens (MAD
outliers), seasonal-profile anomalies (hour-of-day baselines), and
experiment analysis (two-proportion z-test on a deterministic hash
split).

These extend the reference's aggregation vocabulary (SURVEY §2.4 —
GROUP BY + HAVING shapes in `Assignment 1/...ipynb` and the Redshift
TPC-H aggregates `Assignment 6/src/AmazonRedshift.java:300-420`) with
the statistics a corpus-curation / experimentation pipeline runs that
none of the seven reference assignments cover: distribution entropy
monitoring, robust (median-based) outlier detection, seasonality
baselining, and significance testing of conversion deltas.

Scale notes (100 TB):
- entropy: counts flow from ONE (source, term)-keyed aggregate with
  map-side partials; per-term contributions are rounded to integer
  micro-nats BEFORE the per-source sum (aggregation-order-proof), the
  same discipline as source_kl_divergence.
- MAD: two per-type sorted passes over the SAME event_type-keyed
  exchange (median, then median-of-absolute-deviations); group count
  (event types) bounds the sort parallelism unit, AQE splits skew.
  All math BIGINT micro — no float anywhere.
- seasonality: per-(type, hour-of-day) baseline is a TINY aggregate
  (|types|×24 rows) built with map-side partials, broadcast back for
  the anomaly count — two scans, ZERO full-table shuffles (vs the
  window formulation which would sort the whole fact table).
- z-test: reduces to 4 BIGINT counts (one user-keyed aggregate);
  the closed form runs on doubles LAST, on a 2-row frame, with the
  expression tree pinned identically in both engines (IEEE-exact
  divisions/sqrt on identical inputs).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.operators import text as T


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)["events"]


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("documents",), register=False)["documents"]


def _vmicro():
    return F.round(F.col("value") * 1000000.0, 0).cast("long")


# --- information-theoretic corpus stats -----------------------------------


def source_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT — Shannon entropy of each source's unigram distribution, in
    integer micro-nats: (source, n_tokens, n_terms, entropy_micro).
    The diversity monitor next to [KL drift] source_kl_divergence — a
    source whose entropy collapses went template/boilerplate; one whose
    entropy spikes changed domain. Per-term p·ln(1/p) is rounded to
    integer micros BEFORE the per-source sum (aggregation-order-proof)."""
    d = _documents(spark, sf_dir)
    occ = d.select(
        "source", F.explode_outer(T.tokens(F.col("text"))).alias("term")
    ).filter(F.col("term").isNotNull())
    st = occ.groupBy("source", "term").agg(F.count("*").alias("c_st"))
    s_tot = st.groupBy("source").agg(
        F.sum("c_st").alias("total_s"), F.count("*").alias("n_terms")
    )
    ps = F.col("c_st").cast("double") / F.col("total_s")
    tm = F.round(F.lit(-1000000.0) * ps * F.log(ps), 0).cast("long")
    return (
        st.join(F.broadcast(s_tot), "source")
        .select("source", "total_s", "n_terms", tm.alias("tm"))
        .groupBy("source", "total_s", "n_terms")
        .agg(F.sum("tm").alias("entropy_micro"))
        .select(
            "source",
            F.col("total_s").alias("n_tokens"),
            F.col("n_terms").cast("long").alias("n_terms"),
            "entropy_micro",
        )
        .orderBy("source")
    )


# --- robust outlier screen (MAD) ------------------------------------------


def mad_outlier_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T19a — median / MAD (median absolute deviation) robust outlier
    screen per event_type, all in exact BIGINT micros: an event is an
    outlier when |v - median| > 3·MAD (strict). Lower-median semantics
    (first order statistic with 2·rank ≥ n) on both engines, so ties
    and even counts are exact — no interpolation, no float."""
    ev = _events(spark, sf_dir).select("event_type", "event_id", _vmicro().alias("vmicro"))
    wt = Window.partitionBy("event_type")
    w1 = wt.orderBy(F.col("vmicro").asc(), F.col("event_id").asc())
    ranked = ev.select(
        "event_type",
        "event_id",
        "vmicro",
        F.row_number().over(w1).alias("rn"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    med = (
        ranked.filter(F.col("rn") * 2 >= F.col("n"))
        .groupBy("event_type")
        .agg(F.min("vmicro").alias("med_micro"))
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        "vmicro",
        "med_micro",
        F.abs(F.col("vmicro") - F.col("med_micro")).alias("absdev"),
    )
    w2 = wt.orderBy(F.col("absdev").asc(), F.col("event_id").asc())
    ranked2 = dev.select(
        "event_type",
        "absdev",
        F.row_number().over(w2).alias("rn"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    mad = (
        ranked2.filter(F.col("rn") * 2 >= F.col("n"))
        .groupBy("event_type")
        .agg(F.min("absdev").alias("mad_micro"))
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("med_micro").alias("med_micro"),
            F.min("mad_micro").alias("mad_micro"),
            F.sum(
                F.when(F.col("absdev") > 3 * F.col("mad_micro"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


# --- seasonal-profile anomalies -------------------------------------------


def hourly_seasonality_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T19b — hour-of-day seasonal baseline per event_type with anomaly
    counts: an event is anomalous when its value exceeds 2× the mean of
    its (type, hour-of-day) cell. The comparison is exact rational
    arithmetic — v > 2·mean ⇔ v·n > 2·sum — so no float division ever
    happens. The baseline is a |types|×24-row aggregate (map-side
    partials), broadcast back; two scans, zero full-table shuffles."""
    ev = _events(spark, sf_dir).select(
        "event_type", F.hour("ts").alias("hod"), _vmicro().alias("vmicro")
    )
    base = ev.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).alias("n"), F.sum("vmicro").alias("sum_micro")
    )
    flagged = (
        ev.join(F.broadcast(base), ["event_type", "hod"])
        .groupBy("event_type", "hod")
        .agg(
            F.sum(
                F.when(F.col("vmicro") * F.col("n") > 2 * F.col("sum_micro"), 1).otherwise(0)
            ).alias("n_anomalies")
        )
    )
    return (
        base.join(flagged, ["event_type", "hod"])
        .select("event_type", "hod", "n", "sum_micro", "n_anomalies")
        .orderBy("event_type", "hod")
    )


# --- two-proportion z-test -------------------------------------------------


def conversion_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T19c — two-proportion z-test of purchase conversion between a
    deterministic 50/50 hash split of users (md5 parity — the seedless
    assignment an experiment platform uses, portable across engines).
    Counts are exact BIGINT; the pooled-variance closed form runs on
    doubles LAST with a pinned expression tree. Output: one row per
    bucket with counts + conversion bp, plus the shared z_micro."""
    ev = _events(spark, sf_dir)
    users = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 100.0), 1
                ).otherwise(0)
            ).alias("conv")
        )
        .select(
            (
                F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
                .cast("long")
                % 2
            ).alias("bucket"),
            "conv",
        )
    )
    counts = users.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("conv").alias("n_conv")
    )
    # 2-row frame: pivot the opposing bucket in via a window sum.
    wall = Window.partitionBy()
    both = counts.select(
        "bucket",
        "n_users",
        "n_conv",
        (F.sum("n_users").over(wall) - F.col("n_users")).alias("n_other"),
        (F.sum("n_conv").over(wall) - F.col("n_conv")).alias("conv_other"),
    )
    pa = F.col("n_conv").cast("double") / F.col("n_users").cast("double")
    pb = F.col("conv_other").cast("double") / F.col("n_other").cast("double")
    pp = (F.col("n_conv") + F.col("conv_other")).cast("double") / (
        F.col("n_users") + F.col("n_other")
    ).cast("double")
    se = F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (
            F.lit(1.0) / F.col("n_users").cast("double")
            + F.lit(1.0) / F.col("n_other").cast("double")
        )
    )
    z = (pa - pb) / se
    return both.select(
        "bucket",
        "n_users",
        "n_conv",
        F.expr("(n_conv * 10000) div n_users").alias("conv_bp"),
        F.round(z * 1000000.0, 0).cast("long").alias("z_micro"),
    ).orderBy("bucket")


QUERIES = {
    "ext_source_token_entropy": source_token_entropy,
    "t19_mad_outlier_summary": mad_outlier_summary,
    "t19_hourly_seasonality_anomalies": hourly_seasonality_anomalies,
    "t19_conversion_ab_ztest": conversion_ab_ztest,
}

_TOKS = "regexp_split_to_array(lower(trim(text)), '\\s+')"

ORACLE = {
    "ext_source_token_entropy": f"""
        WITH occ AS (SELECT source, unnest({_TOKS}) AS term FROM documents),
        st AS (SELECT source, term, COUNT(*) AS c_st FROM occ GROUP BY 1, 2),
        tot AS (SELECT source, CAST(SUM(c_st) AS BIGINT) AS total_s,
                       CAST(COUNT(*) AS BIGINT) AS n_terms
                FROM st GROUP BY 1)
        SELECT st.source, tot.total_s AS n_tokens, tot.n_terms,
               CAST(SUM(CAST(round(-1000000.0 * (c_st / CAST(total_s AS DOUBLE))
                   * ln(c_st / CAST(total_s AS DOUBLE)), 0) AS BIGINT)) AS BIGINT)
                   AS entropy_micro
        FROM st JOIN tot ON st.source = tot.source
        GROUP BY 1, 2, 3
        ORDER BY 1
    """,
    "t19_mad_outlier_summary": """
        WITH ev AS (
            SELECT event_type, event_id,
                   CAST(round(value * 1000000.0, 0) AS BIGINT) AS vmicro
            FROM events
        ),
        r1 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                   ORDER BY vmicro, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n FROM ev),
        med AS (SELECT event_type, CAST(MIN(vmicro) AS BIGINT) AS med_micro
                FROM r1 WHERE rn * 2 >= n GROUP BY 1),
        dev AS (SELECT ev.event_type, ev.event_id, ev.vmicro, med.med_micro,
                       abs(ev.vmicro - med.med_micro) AS absdev
                FROM ev JOIN med ON ev.event_type = med.event_type),
        r2 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                   ORDER BY absdev, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n FROM dev),
        mad AS (SELECT event_type, CAST(MIN(absdev) AS BIGINT) AS mad_micro
                FROM r2 WHERE rn * 2 >= n GROUP BY 1)
        SELECT dev.event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(dev.med_micro) AS BIGINT) AS med_micro,
               CAST(MIN(mad.mad_micro) AS BIGINT) AS mad_micro,
               CAST(SUM(CASE WHEN dev.absdev > 3 * mad.mad_micro THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers
        FROM dev JOIN mad ON dev.event_type = mad.event_type
        GROUP BY 1
        ORDER BY 1
    """,
    "t19_hourly_seasonality_anomalies": """
        WITH ev AS (
            SELECT event_type, CAST(hour(ts) AS INT) AS hod,
                   CAST(round(value * 1000000.0, 0) AS BIGINT) AS vmicro
            FROM events
        ),
        base AS (SELECT event_type, hod, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(vmicro) AS BIGINT) AS sum_micro
                 FROM ev GROUP BY 1, 2)
        SELECT base.event_type, base.hod, base.n, base.sum_micro,
               CAST(SUM(CASE WHEN ev.vmicro * base.n > 2 * base.sum_micro
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
        FROM ev JOIN base ON ev.event_type = base.event_type AND ev.hod = base.hod
        GROUP BY 1, 2, 3, 4
        ORDER BY 1, 2
    """,
    "t19_conversion_ab_ztest": """
        WITH u AS (
            SELECT (('0x' || substring(md5(user_id::VARCHAR), 1, 8))::BIGINT) % 2
                       AS bucket,
                   MAX(CASE WHEN event_type = 'purchase' AND value > 100.0
                       THEN 1 ELSE 0 END) AS conv
            FROM events GROUP BY user_id
        ),
        c AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_users,
                     CAST(SUM(conv) AS BIGINT) AS n_conv
              FROM u GROUP BY 1),
        b AS (SELECT bucket, n_users, n_conv,
                     CAST(SUM(n_users) OVER () - n_users AS BIGINT) AS n_other,
                     CAST(SUM(n_conv) OVER () - n_conv AS BIGINT) AS conv_other
              FROM c)
        SELECT bucket, n_users, n_conv,
               CAST((n_conv * 10000) // n_users AS BIGINT) AS conv_bp,
               CAST(round(
                   ((CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE))
                    - (CAST(conv_other AS DOUBLE) / CAST(n_other AS DOUBLE)))
                   / sqrt(
                       (CAST(n_conv + conv_other AS DOUBLE)
                            / CAST(n_users + n_other AS DOUBLE))
                       * (1.0 - CAST(n_conv + conv_other AS DOUBLE)
                            / CAST(n_users + n_other AS DOUBLE))
                       * (1.0 / CAST(n_users AS DOUBLE)
                          + 1.0 / CAST(n_other AS DOUBLE)))
                   * 1000000.0, 0) AS BIGINT) AS z_micro
        FROM b
        ORDER BY bucket
    """,
}


# --- token-budget contiguous sharding -------------------------------------

_SHARD_BUDGET = 500


def token_budget_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT — contiguous token-budget sharding manifest, per source: docs
    in doc_id order are packed into shards of ``_SHARD_BUDGET`` tokens
    (a doc belongs to the shard where its cumulative-token offset
    starts; ``n_straddlers`` counts docs whose span crosses the shard
    boundary — the docs a sequence-packing trainer must split or pad
    around). The shard map a 100 TB pretraining run uses to hand
    contiguous corpus slices to data-loader workers.

    Scale: the running offset is a window cumsum PER SOURCE — sources
    are the parallelism unit, so no global total order is ever built
    (cf. operators/rank.py global_running_max for the two-phase global
    variant when a single stream must be sharded)."""
    d = _documents(spark, sf_dir)
    tok = d.select("source", "doc_id", T.token_count(F.col("text")).alias("tok"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = tok.select(
        "source",
        "doc_id",
        "tok",
        F.coalesce(F.sum("tok").over(w), F.lit(0)).alias("off"),
    ).select(
        "source",
        "doc_id",
        "tok",
        F.expr(f"off div {_SHARD_BUDGET}").alias("shard_id"),
        F.expr(f"(off + tok - 1) div {_SHARD_BUDGET}").alias("end_shard"),
    )
    return (
        placed.groupBy("source", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").alias("shard_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
            F.sum(
                F.when(F.col("end_shard") > F.col("shard_id"), 1).otherwise(0)
            ).alias("n_straddlers"),
        )
        .orderBy("source", "shard_id")
    )


# --- market-basket lift on TPC-H orders -----------------------------------


def basket_part_pairs_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T19d — co-purchased part pairs with lift, top 50 by support:
    lift(a,b) = P(a,b)/(P(a)P(b)) = n_ab·N/(n_a·n_b) in floored integer
    micros — entirely BIGINT (counts only), so cross-engine exact.

    Scale: pair fan-out is generated from per-order sorted part SETS
    (one orderkey-keyed aggregate; order size bounds the quadratic
    term, ~4-13 parts/order) — the self-join formulation would shuffle
    the lineitem table twice instead. Per-part and global counts
    broadcast back onto the (tiny) pair aggregate."""
    from bigdatamanagement_spark.queries.analytics7 import (
        copurchase_weighted_pairs,
    )

    li = load_testdata(spark, sf_dir, tables=("lineitem",), register=False)["lineitem"]
    op = li.select("l_orderkey", "l_partkey").distinct()
    n_ab = copurchase_weighted_pairs(spark, sf_dir).select(
        F.col("a").alias("pa"), F.col("b").alias("pb"), F.col("c").alias("n_ab")
    )
    n_part = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_orders"))
    n_tot = op.select("l_orderkey").distinct().agg(F.count(F.lit(1)).alias("n"))
    return (
        n_ab.join(F.broadcast(n_part.withColumnRenamed("l_partkey", "pa")), "pa")
        .withColumnRenamed("n_orders", "n_a")
        .join(
            F.broadcast(
                n_part.withColumnRenamed("l_partkey", "pb").withColumnRenamed(
                    "n_orders", "n_b"
                )
            ),
            "pb",
        )
        .join(F.broadcast(n_tot))
        .select(
            "pa",
            "pb",
            "n_ab",
            "n_a",
            "n_b",
            F.expr("(1000000 * n_ab * n) div (n_a * n_b)").alias("lift_micro"),
        )
        .orderBy(F.col("n_ab").desc(), "pa", "pb")
        .limit(50)
    )


# --- trigram prefix-filter similarity join --------------------------------

# Jaccard threshold 3/4, AllPairs/PPJoin prefix scheme (Bayardo et al.,
# WWW'07): under a global token frequency order, any pair with
# Jaccard ≥ t must share a token within each side's first
# |s| - ceil(t·|s|) + 1 tokens.
_TRI_NUM, _TRI_DEN = 3, 4


def trigram_similarity_bands(
    spark: SparkSession, sf_dir: str, sampled: bool = False
) -> DataFrame:
    """EXT — character-trigram Jaccard similarity self-join over part
    names (threshold 3/4) via PREFIX FILTERING, reported as per-band
    summaries: (jacc_bp, n_pairs, sum_pa, sum_pb) — the key checksums
    make the comparison sensitive to any missed/extra pair while
    keeping the gate result compact (the raw pair set is cluster-
    quadratic on duplicate-heavy catalogs).

    Scale (dedup-first AllPairs): the similarity join runs over
    DISTINCT name fingerprints — duplicate-heavy catalogs (this
    testdata: 64 distinct names across 20k parts) never enter the
    candidate join at row cardinality. Over the distinct sets,
    candidates come ONLY from pairs sharing a token in both sides'
    frequency-ordered prefixes (AllPairs), so diverse catalogs stay
    subquadratic too. The pair-level checksums are then recovered
    WITHOUT materializing the (quadratic) row-pair set: for each
    similar name pair, group members merge-rank by partkey and each
    key contributes key x (#partner keys above/below it) — sum_pa/
    sum_pb/n_pairs fall out of one windowed aggregate over
    |members|-sized partitions. The DuckDB oracle runs the true
    brute-force row-pair join, so the gate is a completeness AND
    rank-algebra proof."""
    p = load_testdata(spark, sf_dir, tables=("part",), register=False)["part"]
    if sampled:
        # sf0.1-verifiable twin (queries/sampled.py): ~1/40 of parts so
        # the DuckDB brute-force row-pair oracle stays feasible
        p = p.filter(F.expr("p_partkey % 40 = 3"))
    pk = p.select(F.lower(F.col("p_name")).alias("nm"), F.col("p_partkey").alias("k"))
    nd = pk.groupBy("nm").agg(F.count(F.lit(1)).alias("c"))
    tri = nd.select(
        "nm",
        "c",
        F.expr(
            "array_distinct(transform(sequence(1, length(nm) - 2), "
            "i -> substring(nm, i, 3)))"
        ).alias("s"),
    )
    tokf = (
        tri.select(F.explode("s").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    wtok = Window.partitionBy("nm").orderBy("df", "tok")
    pref = (
        tri.select("nm", F.size("s").alias("sz"), F.explode("s").alias("tok"))
        .join(F.broadcast(tokf), "tok")
        .select(
            "nm",
            "tok",
            F.row_number().over(wtok).alias("pos"),
            F.expr(f"sz - ceil({_TRI_NUM} * sz / {_TRI_DEN}) + 1").alias("plen"),
        )
        .filter(F.col("pos") <= F.col("plen"))
        .select("tok", "nm")
    )
    cand = (
        pref.alias("a")
        .join(pref.alias("b"), "tok")
        .filter(F.col("a.nm") < F.col("b.nm"))
        .select(F.col("a.nm").alias("na"), F.col("b.nm").alias("nb"))
        .distinct()
    )
    sim = (
        cand.join(tri.select(F.col("nm").alias("na"), F.col("s").alias("sa")), "na")
        .join(tri.select(F.col("nm").alias("nb"), F.col("s").alias("sb")), "nb")
        .select(
            "na",
            "nb",
            F.size(F.expr("array_intersect(sa, sb)")).alias("inter"),
            (F.size("sa") + F.size("sb")).alias("ab"),
        )
        .filter(F.col("inter") * (_TRI_DEN + _TRI_NUM) >= _TRI_NUM * F.col("ab"))
        .select("na", "nb", F.expr("(10000 * inter) div (ab - inter)").alias("jacc_bp"))
    )
    # identical names pair among themselves at J = 1 (sets equal, nonempty)
    ident = nd.filter(F.col("c") >= 2).select(
        F.col("nm").alias("na"), F.col("nm").alias("nb"), F.lit(10000).alias("jacc_bp")
    )
    pairs = sim.unionByName(ident)
    # expand each similar name pair to its member keys (side 0 = na's
    # parts, side 1 = nb's; identity pairs are single-sided)
    rows = pk.join(F.broadcast(pairs), pk["nm"] == pairs["na"]).select(
        "na", "nb", "jacc_bp", "k", F.lit(0).alias("side")
    ).unionByName(
        pk.join(
            F.broadcast(pairs.filter(F.col("na") != F.col("nb"))),
            pk["nm"] == pairs["nb"],
        ).select("na", "nb", "jacc_bp", "k", F.lit(1).alias("side"))
    )
    w_cum = (
        Window.partitionBy("na", "nb")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("na", "nb")
    ranked = (
        rows.withColumn("cum0", F.sum(1 - F.col("side")).over(w_cum))
        .withColumn("cum1", F.sum("side").over(w_cum))
        .withColumn("tot0", F.sum(1 - F.col("side")).over(w_all))
        .withColumn("tot1", F.sum("side").over(w_all))
        .select(
            "na",
            "nb",
            "jacc_bp",
            "k",
            # partner keys strictly below / above this key (partkeys
            # are unique, so inclusive cum counts are strict-below)
            F.when(F.col("na") == F.col("nb"), F.col("cum0") - 1)
            .when(F.col("side") == 0, F.col("cum1"))
            .otherwise(F.col("cum0"))
            .alias("below"),
            F.when(F.col("na") == F.col("nb"), F.col("tot0") - F.col("cum0"))
            .when(F.col("side") == 0, F.col("tot1") - F.col("cum1"))
            .otherwise(F.col("tot0") - F.col("cum0"))
            .alias("above"),
        )
    )
    # each unordered pair contributes its min key once (counted from
    # the min element's `above`) and its max key once (`below`)
    return (
        ranked.groupBy("jacc_bp")
        .agg(
            F.sum("below").cast("long").alias("n_pairs"),
            F.sum(F.col("k") * F.col("above")).cast("long").alias("sum_pa"),
            F.sum(F.col("k") * F.col("below")).cast("long").alias("sum_pb"),
        )
        .orderBy("jacc_bp")
    )


# --- vocabulary growth (Heaps' law) curve ---------------------------------


def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT — cumulative vocabulary growth over the corpus in doc_id
    order, at 20 evenly spaced checkpoints (Heaps' law curve): each
    bucket reports docs/tokens so far and the cumulative distinct
    vocabulary. The sub-linearity diagnostic of corpus health — a
    vocabulary that grows LINEARLY is noise/IDs, one that flatlines is
    boilerplate.

    Scale: 'cumulative distinct' needs each term only at its FIRST
    bucket — one (term → min bucket) aggregate, then a 20-row cumsum;
    no sliding-distinct expansion, no global sort (bucket =
    doc_id·20 div (max+1) from a broadcast 1-row max)."""
    d = _documents(spark, sf_dir)
    mx = d.agg((F.max("doc_id") + 1).alias("hi"))
    db = d.join(F.broadcast(mx)).select(
        F.expr("(doc_id * 20) div hi").alias("bucket"),
        "doc_id",
        T.tokens(F.col("text")).alias("toks"),
    )
    per_bucket = db.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum(F.size("toks")).alias("n_tokens")
    )
    first_b = (
        db.select("bucket", F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("new_terms"))
    )
    wcum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_bucket.join(first_b, "bucket", "left")
        .select(
            "bucket",
            F.sum("n_docs").over(wcum).alias("cum_docs"),
            F.sum("n_tokens").over(wcum).alias("cum_tokens"),
            F.sum(F.coalesce(F.col("new_terms"), F.lit(0))).over(wcum).alias("cum_vocab"),
        )
        .orderBy("bucket")
    )


QUERIES.update(
    {
        "ext_token_budget_shards": token_budget_shards,
        "t19_basket_part_pairs_lift": basket_part_pairs_lift,
        "ext_trigram_similarity_bands": trigram_similarity_bands,
        "ext_vocab_growth_curve": vocab_growth_curve,
    }
)

ORACLE.update(
    {
        "ext_token_budget_shards": f"""
            WITH tok AS (
                SELECT source, doc_id,
                       CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+'))
                            AS BIGINT) AS tok
                FROM documents
            ),
            placed AS (
                SELECT source, doc_id, tok,
                       CAST(COALESCE(SUM(tok) OVER (PARTITION BY source
                           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS BIGINT) AS off
                FROM tok
            )
            SELECT source, CAST(off // {_SHARD_BUDGET} AS BIGINT) AS shard_id,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(tok) AS BIGINT) AS shard_tokens,
                   CAST(MIN(doc_id) AS BIGINT) AS first_doc,
                   CAST(MAX(doc_id) AS BIGINT) AS last_doc,
                   CAST(SUM(CASE WHEN (off + tok - 1) // {_SHARD_BUDGET}
                        > off // {_SHARD_BUDGET} THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_straddlers
            FROM placed
            GROUP BY 1, 2
            ORDER BY 1, 2
        """,
        "t19_basket_part_pairs_lift": """
            WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            pairs AS (
                SELECT a.l_partkey AS pa, b.l_partkey AS pb,
                       CAST(COUNT(*) AS BIGINT) AS n_ab
                FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey
                GROUP BY 1, 2
            ),
            np AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_orders
                   FROM op GROUP BY 1),
            nt AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM op)
            SELECT pa, pb, n_ab, a.n_orders AS n_a, b.n_orders AS n_b,
                   CAST((1000000 * n_ab * nt.n) // (a.n_orders * b.n_orders)
                        AS BIGINT) AS lift_micro
            FROM pairs
            JOIN np a ON pairs.pa = a.l_partkey
            JOIN np b ON pairs.pb = b.l_partkey
            CROSS JOIN nt
            ORDER BY n_ab DESC, pa, pb
            LIMIT 50
        """,
        "ext_trigram_similarity_bands": """
            WITH t AS (
                SELECT p_partkey AS k,
                       list_distinct(list_transform(
                           generate_series(1, length(lower(p_name)) - 2),
                           i -> substring(lower(p_name), CAST(i AS INT), 3))) AS s
                FROM part
            ),
            pairs AS (
                SELECT a.k AS ka, b.k AS kb,
                       CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter,
                       CAST(len(a.s) + len(b.s) AS BIGINT) AS ab
                FROM t a JOIN t b ON a.k < b.k
            ),
            v AS (
                SELECT ka, kb, CAST((10000 * inter) // (ab - inter) AS BIGINT)
                           AS jacc_bp
                FROM pairs WHERE inter * 7 >= 3 * ab
            )
            SELECT jacc_bp, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(ka) AS BIGINT) AS sum_pa,
                   CAST(SUM(kb) AS BIGINT) AS sum_pb
            FROM v
            GROUP BY 1
            ORDER BY 1
        """,
        "ext_vocab_growth_curve": """
            WITH mx AS (SELECT MAX(doc_id) + 1 AS hi FROM documents),
            db AS (
                SELECT (doc_id * 20) // hi AS bucket, doc_id,
                       regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
                FROM documents CROSS JOIN mx
            ),
            pb AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
                          CAST(SUM(len(toks)) AS BIGINT) AS n_tokens
                   FROM db GROUP BY 1),
            fb AS (
                SELECT bucket, CAST(COUNT(*) AS BIGINT) AS new_terms
                FROM (SELECT term, MIN(bucket) AS bucket
                      FROM (SELECT bucket, unnest(toks) AS term FROM db)
                      GROUP BY 1)
                GROUP BY 1
            )
            SELECT pb.bucket,
                   CAST(SUM(pb.n_docs) OVER (ORDER BY pb.bucket) AS BIGINT)
                       AS cum_docs,
                   CAST(SUM(pb.n_tokens) OVER (ORDER BY pb.bucket) AS BIGINT)
                       AS cum_tokens,
                   CAST(SUM(COALESCE(fb.new_terms, 0)) OVER (ORDER BY pb.bucket)
                       AS BIGINT) AS cum_vocab
            FROM pb LEFT JOIN fb ON pb.bucket = fb.bucket
            ORDER BY 1
        """,
    }
)


# --- cohort time-to-conversion --------------------------------------------


def time_to_first_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T19e — survival-style time-to-conversion per activation cohort:
    users cohorted by the calendar day of their FIRST event; per cohort
    the converter count and the exact median / p90 of (first purchase −
    activation) in whole seconds (lower order statistic at the rank
    crossing — no interpolation, all BIGINT).

    Scale: ONE user-keyed aggregate produces (cohort, delta); quantiles
    sort within cohort partitions (cohort-day count bounds the sort
    unit, AQE splits skew)."""
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("act_us"),
        F.min(
            F.when(
                F.col("event_type") == "purchase",
                F.unix_micros(F.col("ts").cast("timestamp")),
            )
        ).alias("purch_us"),
    )
    cohorted = per_user.select(
        "user_id",
        F.to_date(F.timestamp_micros(F.col("act_us"))).alias("cohort_day"),
        F.expr("(purch_us - act_us) div 1000000").alias("delta_s"),
    )
    base = cohorted.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("delta_s").alias("n_conv"),
    )
    conv = cohorted.filter(F.col("delta_s").isNotNull())
    wc = Window.partitionBy("cohort_day").orderBy("delta_s", "user_id")
    ranked = conv.select(
        "cohort_day",
        "delta_s",
        F.row_number().over(wc).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("cohort_day")).alias("n"),
    )
    med = (
        ranked.filter(F.col("rn") * 2 >= F.col("n"))
        .groupBy("cohort_day")
        .agg(F.min("delta_s").alias("med_s"))
    )
    p90 = (
        ranked.filter(F.col("rn") * 10 >= F.col("n") * 9)
        .groupBy("cohort_day")
        .agg(F.min("delta_s").alias("p90_s"))
    )
    return (
        base.join(med, "cohort_day", "left")
        .join(p90, "cohort_day", "left")
        .select("cohort_day", "n_users", "n_conv", "med_s", "p90_s")
        .orderBy("cohort_day")
    )


# --- single-scan table profile --------------------------------------------


def events_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT — data-profiling report for the events table: per column the
    null count, distinct count, and canonical min/max — the first step
    of any ingest QA. Non-portable lexical forms are canonicalized
    BEFORE profiling (ts → unix micros, value → micro BIGINT) so the
    min/max strings are engine-exact.

    Scale: the null/min/max aggregates fold into ONE aggregate over one
    scan; each count_distinct runs as its OWN partial-distinct aggregate
    joined onto the 1-row result instead of riding the multi-distinct
    Expand plan (Expand multiplies every input row once per distinct
    column — 7x the rows through one aggregate with a combined hash map;
    seven independent 1-row aggregates schedule concurrently and
    measured 2.4-3.0 s -> 0.4-0.7 s, identical counts). The 6-row
    reshape happens on the 1-row result."""
    ev = _events(spark, sf_dir).select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "user_id",
        "event_type",
        _vmicro().alias("vmicro"),
        "props",
    )
    cols = ["event_id", "ts_us", "user_id", "event_type", "vmicro", "props"]
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    one = ev.agg(*aggs)
    for c in cols:
        one = one.join(ev.agg(F.count_distinct(F.col(c)).alias(f"{c}__nd")))
    stack = ", ".join(
        f"'{c}', {c}__nulls, {c}__nd, {c}__min, {c}__max" for c in cols
    )
    return one.select(
        "n",
        F.expr(
            f"stack({len(cols)}, {stack}) AS (column_name, n_nulls, n_distinct,"
            " min_s, max_s)"
        ),
    ).select(
        "column_name", "n", "n_nulls", "n_distinct", "min_s", "max_s"
    ).orderBy("column_name")


# --- triangle counting on the co-purchase graph ---------------------------


def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T19f — triangle count of the part co-purchase graph (edges =
    part pairs bought together in ≥2 distinct orders): one-row
    (n_vertices, n_edges, n_triangles). The clustering signal that
    separates genuine product affinity (closed triads) from hub noise.

    Scale: edges are oriented low-key→high-key so each triangle is
    enumerated exactly once (a<b<c); the two-path build joins the
    oriented edge list with itself on the middle vertex, then one more
    join closes the wedge — the standard distributed formulation (at
    extreme skew, re-orient by degree instead of key to bound wedge
    fan-out). The support-≥2 filter prunes the edge list before any
    join."""
    from bigdatamanagement_spark.queries.analytics7 import _copurchase_edges

    edges = _copurchase_edges(spark, sf_dir)
    verts = edges.select(F.col("a").alias("v")).union(
        edges.select(F.col("b").alias("v"))
    ).distinct()
    wedges = (
        edges.alias("e1")
        .join(edges.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(F.col("e1.a").alias("a"), F.col("e1.b").alias("b"), F.col("e2.b").alias("c"))
    )
    tri = wedges.join(
        edges.select(F.col("a").alias("a"), F.col("b").alias("c")),
        ["a", "c"],
    )
    return (
        verts.agg(F.count(F.lit(1)).alias("n_vertices"))
        .join(edges.agg(F.count(F.lit(1)).alias("n_edges")))
        .join(tri.agg(F.count(F.lit(1)).alias("n_triangles")))
    )


# --- positional phrase search ---------------------------------------------

_PHRASES = ("table hash", "part filter", "customer join")


def phrase_search_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT — positional phrase search: for each query phrase, the
    per-source matching-document and occurrence counts. The capability
    RediSearch exact-phrase queries provide (SURVEY §2 — `Assignment
    5/redis_client.py:302-313` builds the text index) that TF-IDF/BM25
    bag-of-words retrieval cannot: adjacency matters.

    Scale: occurrence counting is pure array work inside codegen (no
    explode — a length-|doc| position filter per phrase); the aggregate
    is (phrase, source)-keyed with map-side partials."""
    d = _documents(spark, sf_dir)
    toks = d.select("source", T.tokens(F.col("text")).alias("toks"))
    occ_cols = []
    for i, ph in enumerate(_PHRASES):
        w1, w2 = ph.split(" ")
        # guard: sequence(1, 0) descends in Spark, so 1-token docs would
        # probe index 0 (ANSI error) — short docs simply have 0 matches
        occ_cols.append(
            F.when(
                F.size("toks") >= 2,
                F.size(
                    F.expr(
                        f"filter(sequence(1, size(toks) - 1), i -> "
                        f"element_at(toks, i) = '{w1}' AND element_at(toks, i + 1) = '{w2}')"
                    )
                ),
            )
            .otherwise(0)
            .alias(f"occ{i}")
        )
    wide = toks.select("source", *occ_cols)
    stack = ", ".join(f"'{ph}', occ{i}" for i, ph in enumerate(_PHRASES))
    long = wide.select(
        "source", F.expr(f"stack({len(_PHRASES)}, {stack}) AS (phrase, occ)")
    ).filter(F.col("occ") > 0)
    return (
        long.groupBy("phrase", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("occ").alias("n_occurrences"))
        .orderBy("phrase", "source")
    )


# --- last-touch attribution -----------------------------------------------


def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T19g — marketing-style last-touch attribution: every purchase is
    credited to the SAME user's most recent preceding non-purchase
    event type ('none' when the purchase opens the history). Share in
    floored basis points of all purchases.

    Scale: one user-keyed window (the shared behavioral exchange);
    last(ignorenulls) over an unbounded-preceding frame is O(1) state
    per row."""
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touched = ev.select(
        "event_type",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        )
        .over(w)
        .alias("prev_type"),
    ).filter(F.col("event_type") == "purchase")
    agg = touched.groupBy(
        F.coalesce(F.col("prev_type"), F.lit("none")).alias("attributed_type")
    ).agg(F.count(F.lit(1)).alias("n_purchases"))
    tot = agg.agg(F.sum("n_purchases").alias("tot"))
    return (
        agg.join(F.broadcast(tot))
        .select(
            "attributed_type",
            "n_purchases",
            F.expr("(10000 * n_purchases) div tot").alias("share_bp"),
        )
        .orderBy("attributed_type")
    )


QUERIES.update(
    {
        "t19_time_to_first_purchase": time_to_first_purchase,
        "ext_events_table_profile": events_table_profile,
        "t19_copurchase_triangles": copurchase_triangles,
        "ext_phrase_search_counts": phrase_search_counts,
        "t19_last_touch_attribution": last_touch_attribution,
    }
)

ORACLE.update(
    {
        "t19_time_to_first_purchase": """
            WITH pu AS (
                SELECT user_id,
                       MIN(epoch_us(ts)) AS act_us,
                       MIN(CASE WHEN event_type = 'purchase'
                           THEN epoch_us(ts) END) AS purch_us
                FROM events GROUP BY 1
            ),
            c AS (
                SELECT user_id, CAST(make_timestamp(act_us) AS DATE) AS cohort_day,
                       (purch_us - act_us) // 1000000 AS delta_s
                FROM pu
            ),
            base AS (SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS n_users,
                            CAST(COUNT(delta_s) AS BIGINT) AS n_conv
                     FROM c GROUP BY 1),
            r AS (SELECT cohort_day, delta_s,
                         ROW_NUMBER() OVER (PARTITION BY cohort_day
                             ORDER BY delta_s, user_id) AS rn,
                         COUNT(*) OVER (PARTITION BY cohort_day) AS n
                  FROM c WHERE delta_s IS NOT NULL),
            med AS (SELECT cohort_day, CAST(MIN(delta_s) AS BIGINT) AS med_s
                    FROM r WHERE rn * 2 >= n GROUP BY 1),
            p90 AS (SELECT cohort_day, CAST(MIN(delta_s) AS BIGINT) AS p90_s
                    FROM r WHERE rn * 10 >= n * 9 GROUP BY 1)
            SELECT base.cohort_day, base.n_users, base.n_conv, med.med_s, p90.p90_s
            FROM base LEFT JOIN med USING (cohort_day)
                      LEFT JOIN p90 USING (cohort_day)
            ORDER BY 1
        """,
        "ext_events_table_profile": """
            WITH ev AS (
                SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
                       CAST(round(value * 1000000.0, 0) AS BIGINT) AS vmicro, props
                FROM events
            ),
            one AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ev)
            SELECT column_name, one.n, n_nulls, n_distinct, min_s, max_s
            FROM one CROSS JOIN (
                SELECT 'event_id' AS column_name,
                       CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
                       CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
                       CAST(MIN(event_id) AS VARCHAR) AS min_s,
                       CAST(MAX(event_id) AS VARCHAR) AS max_s FROM ev
                UNION ALL
                SELECT 'ts_us',
                       CAST(SUM(CASE WHEN ts_us IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                       CAST(COUNT(DISTINCT ts_us) AS BIGINT),
                       CAST(MIN(ts_us) AS VARCHAR), CAST(MAX(ts_us) AS VARCHAR) FROM ev
                UNION ALL
                SELECT 'user_id',
                       CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                       CAST(COUNT(DISTINCT user_id) AS BIGINT),
                       CAST(MIN(user_id) AS VARCHAR), CAST(MAX(user_id) AS VARCHAR) FROM ev
                UNION ALL
                SELECT 'event_type',
                       CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                       CAST(COUNT(DISTINCT event_type) AS BIGINT),
                       MIN(event_type), MAX(event_type) FROM ev
                UNION ALL
                SELECT 'vmicro',
                       CAST(SUM(CASE WHEN vmicro IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                       CAST(COUNT(DISTINCT vmicro) AS BIGINT),
                       CAST(MIN(vmicro) AS VARCHAR), CAST(MAX(vmicro) AS VARCHAR) FROM ev
                UNION ALL
                SELECT 'props',
                       CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                       CAST(COUNT(DISTINCT props) AS BIGINT),
                       MIN(props), MAX(props) FROM ev
            )
            ORDER BY column_name
        """,
        "t19_copurchase_triangles": """
            WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e AS (
                SELECT a.l_partkey AS a, b.l_partkey AS b
                FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey
                GROUP BY 1, 2 HAVING COUNT(*) >= 2
            ),
            v AS (SELECT DISTINCT x AS v FROM (SELECT a AS x FROM e
                  UNION ALL SELECT b FROM e)),
            tri AS (
                SELECT COUNT(*) AS n FROM e e1
                JOIN e e2 ON e1.b = e2.a
                JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
            )
            SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_vertices,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
                   (SELECT CAST(n AS BIGINT) FROM tri) AS n_triangles
        """,
        "ext_phrase_search_counts": """
            WITH t AS (
                SELECT source,
                       regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
                FROM documents
            ),
            wide AS (
                SELECT source,
                       len(list_filter(generate_series(1, len(toks) - 1),
                           i -> toks[i] = 'table' AND toks[i+1] = 'hash')) AS occ0,
                       len(list_filter(generate_series(1, len(toks) - 1),
                           i -> toks[i] = 'part' AND toks[i+1] = 'filter')) AS occ1,
                       len(list_filter(generate_series(1, len(toks) - 1),
                           i -> toks[i] = 'customer' AND toks[i+1] = 'join')) AS occ2
                FROM t
            ),
            long AS (
                SELECT source, 'table hash' AS phrase, occ0 AS occ FROM wide
                UNION ALL
                SELECT source, 'part filter', occ1 FROM wide
                UNION ALL
                SELECT source, 'customer join', occ2 FROM wide
            )
            SELECT phrase, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(occ) AS BIGINT) AS n_occurrences
            FROM long WHERE occ > 0
            GROUP BY 1, 2
            ORDER BY 1, 2
        """,
        "t19_last_touch_attribution": """
            WITH touched AS (
                SELECT event_type,
                       LAST_VALUE(CASE WHEN event_type <> 'purchase'
                           THEN event_type END IGNORE NULLS) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                           AS prev_type
                FROM events
            ),
            agg AS (
                SELECT COALESCE(prev_type, 'none') AS attributed_type,
                       CAST(COUNT(*) AS BIGINT) AS n_purchases
                FROM touched WHERE event_type = 'purchase'
                GROUP BY 1
            )
            SELECT attributed_type, n_purchases,
                   CAST((10000 * n_purchases) // (SELECT SUM(n_purchases) FROM agg)
                        AS BIGINT) AS share_bp
            FROM agg
            ORDER BY 1
        """,
    }
)


# --- quantized-integer cosine top-k (oracle-checkable ANN baseline) -------

_COS_QUERY_IDS = 8
_COS_K = 10


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("embeddings",), register=False)[
        "embeddings"
    ]


def _int_vec(col: str):
    """float vector → exact BIGINT micro components (order-independent
    arithmetic from here on)."""
    return F.expr(
        f"transform({col}, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0, 0) AS BIGINT))"
    )


def int_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT — exact brute-force cosine top-k over QUANTIZED embeddings:
    components are rounded to integer micros FIRST, so the dot product
    and the two squared norms are exact BIGINT sums (order-independent
    — no float-accumulation drift); the single closed-form division
    dot/(√na·√nb) runs LAST on those exact integers with a pinned
    expression tree. The engine-checkable twin of the rows-only
    ext_cosine_topk (same pattern as portable-HLL next to native
    HLL++): cross-engine EXACT ranking, including ties.

    Scale: brute force is the recall-1.0 baseline the ANN entries
    (LSH/IVF/PQ) are measured against; the scan is embarrassingly
    parallel with the tiny query side broadcast."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < _COS_QUERY_IDS).select(
        F.col("vec_id").alias("query_id"), _int_vec("embedding").alias("qv")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), _int_vec("embedding").alias("cv"))
    dot = F.expr("aggregate(zip_with(qv, cv, (x, y) -> x * y), 0L, (a, x) -> a + x)")
    nq = F.expr("aggregate(qv, 0L, (a, x) -> a + x * x)")
    nc = F.expr("aggregate(cv, 0L, (a, x) -> a + x * x)")
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.lit(1000000.0)
                * dot.cast("double")
                / (F.sqrt(nq.cast("double")) * F.sqrt(nc.cast("double"))),
                0,
            )
            .cast("long")
            .alias("cos_micro"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_micro"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _COS_K)
        .orderBy("query_id", "rank")
    )


# --- hybrid retrieval: BM25 ∪ cosine via reciprocal-rank fusion -----------

_RRF_K = 60
_RRF_DEPTH = 20
_RRF_QVEC_ID = 0


def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT — hybrid lexical+semantic retrieval with reciprocal-rank
    fusion (Cormack et al., SIGIR'09): the BM25 top-20 for the standing
    query terms and the quantized-integer-cosine top-20 for the query
    vector (vec_id 0 ≡ doc_id 0) fuse as
    rrf = Σ_lists 1000000 div (60 + rank) — integer end-to-end, so the
    fused ranking is cross-engine exact. Output: top-10 docs with both
    source ranks (NULL where a list missed the doc).

    Scale: each leg is its own bounded top-k (TakeOrderedAndProject /
    broadcast query); fusion joins two ≤20-row frames — free."""
    from bigdatamanagement_spark.operators import search as SR
    from bigdatamanagement_spark.queries.extensions import BM25_QUERY

    d = _documents(spark, sf_dir)
    lex = SR.bm25_search(d, BM25_QUERY, topk=_RRF_DEPTH).select(
        "doc_id", F.col("rank").alias("lex_rank")
    )
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") == _RRF_QVEC_ID).select(
        _int_vec("embedding").alias("qv")
    )
    c = e.select(F.col("vec_id").alias("doc_id"), _int_vec("embedding").alias("cv"))
    dot = F.expr("aggregate(zip_with(qv, cv, (x, y) -> x * y), 0L, (a, x) -> a + x)")
    nq = F.expr("aggregate(qv, 0L, (a, x) -> a + x * x)")
    nc = F.expr("aggregate(cv, 0L, (a, x) -> a + x * x)")
    sem = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("doc_id") != _RRF_QVEC_ID)
        .select(
            "doc_id",
            F.round(
                F.lit(1000000.0)
                * dot.cast("double")
                / (F.sqrt(nq.cast("double")) * F.sqrt(nc.cast("double"))),
                0,
            )
            .cast("long")
            .alias("cos_micro"),
        )
        .orderBy(F.desc("cos_micro"), F.asc("doc_id"))
        .limit(_RRF_DEPTH)
    )
    sem_ranked = sem.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("cos_micro"), F.asc("doc_id")))
        .alias("sem_rank"),
    )
    fused = (
        lex.join(sem_ranked, "doc_id", "full")
        .select(
            "doc_id",
            "lex_rank",
            "sem_rank",
            (
                F.coalesce(F.expr(f"1000000 div ({_RRF_K} + lex_rank)"), F.lit(0))
                + F.coalesce(F.expr(f"1000000 div ({_RRF_K} + sem_rank)"), F.lit(0))
            ).alias("rrf_micro"),
        )
        .orderBy(F.desc("rrf_micro"), F.asc("doc_id"))
        .limit(10)
    )
    return fused.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("rrf_micro"), F.asc("doc_id"))),
    )


# --- population stability index (distribution drift) ----------------------


def value_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT — PSI (population stability index) of the value distribution
    between the first and second halves of the time range, per
    event_type — THE model-monitoring drift metric. 256 fixed
    equi-width buckets (the histogram_quantiles domain), Laplace +1
    smoothing so empty cells are defined, each bucket's
    (p−q)·ln(p/q) rounded to integer micro-nats BEFORE the sum.

    Scale: two tiny (type, bucket) count aggregates with map-side
    partials; the 256-cell dense grid is generated, not shuffled."""
    ev = _events(spark, sf_dir).select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.expr(
            "least(255, (CAST(round(value * 1000000.0, 0) AS BIGINT) * 256)"
            " div 600000000)"
        ).alias("b"),
    )
    span = ev.agg(
        F.expr("(min(ts_us) + max(ts_us)) div 2").alias("mid")
    )
    halves = ev.join(F.broadcast(span)).select(
        "event_type",
        "b",
        F.when(F.col("ts_us") < F.col("mid"), 1).otherwise(0).alias("is_a"),
    )
    counts = halves.groupBy("event_type", "b").agg(
        F.sum("is_a").alias("n_a"), F.sum(1 - F.col("is_a")).alias("n_b")
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("n_a").alias("tot_a"), F.sum("n_b").alias("tot_b")
    )
    grid = (
        tot.select("event_type", "tot_a", "tot_b")
        .select("event_type", "tot_a", "tot_b", F.explode(F.sequence(F.lit(0), F.lit(255))).alias("b"))
    )
    cells = grid.join(counts, ["event_type", "b"], "left").select(
        "event_type",
        "tot_a",
        "tot_b",
        F.coalesce(F.col("n_a"), F.lit(0)).alias("n_a"),
        F.coalesce(F.col("n_b"), F.lit(0)).alias("n_b"),
    )
    p = (F.col("n_a") + 1).cast("double") / (F.col("tot_a") + 256).cast("double")
    qq = (F.col("n_b") + 1).cast("double") / (F.col("tot_b") + 256).cast("double")
    term = F.round(F.lit(1000000.0) * (p - qq) * F.log(p / qq), 0).cast("long")
    return (
        cells.select("event_type", "tot_a", "tot_b", term.alias("t"))
        .groupBy("event_type", "tot_a", "tot_b")
        .agg(F.sum("t").alias("psi_micro"))
        .select(
            "event_type",
            F.col("tot_a").alias("n_first_half"),
            F.col("tot_b").alias("n_second_half"),
            "psi_micro",
        )
        .orderBy("event_type")
    )


# --- trailing-window z-score anomalies on daily counts --------------------


def daily_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T19h — volume-anomaly detection: a day is flagged when its event
    count deviates from the trailing-7-day baseline (excluding itself)
    by more than 2σ — computed EXACTLY as (7x−s)² > 4·(7·ss−s²) on
    BIGINT window sums (z² with the 1/49 scale cleared; no float, no
    sqrt). The day grid is densified first so calendar gaps count as
    zero-volume days (they ARE the anomaly one usually needs to catch).

    Scale: daily counts are a tiny (type, day) aggregate; the window
    runs over |types|·|days| rows."""
    ev = _events(spark, sf_dir).select(
        "event_type", F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("x"))
    span = ev.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    types = ev.select("event_type").distinct()
    grid = types.join(F.broadcast(span)).select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("day")
    )
    dense = grid.join(daily, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce(F.col("x"), F.lit(0)).alias("x")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    flagged = dense.select(
        "event_type",
        "day",
        "x",
        F.count(F.lit(1)).over(w).alias("wn"),
        F.sum("x").over(w).alias("s"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("ss"),
    ).select(
        "event_type",
        "day",
        "x",
        F.when(
            (F.col("wn") == 7)
            & (
                (7 * F.col("x") - F.col("s")) * (7 * F.col("x") - F.col("s"))
                > 4 * (7 * F.col("ss") - F.col("s") * F.col("s"))
            ),
            1,
        )
        .otherwise(0)
        .alias("flag"),
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("flag").alias("n_flagged"),
            F.max("x").alias("max_daily"),
        )
        .orderBy("event_type")
    )


# --- join-key skew profile (exact Gini from the value histogram) ----------


def orderkey_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T19i — shuffle-key skew diagnostics for lineitem.l_orderkey: the
    per-key row-count distribution's exact p50/p99/max and Gini
    coefficient in floored basis points. The pre-flight check before
    sizing a shuffle (salting / AQE skew thresholds).

    Scale: Gini normally needs a GLOBAL sort of per-key counts; here it
    folds over the count-of-counts HISTOGRAM instead — items sharing a
    count value occupy a contiguous rank run, so Σ rank·x telescopes to
    Σ_c c·(f·R_prev + f(f+1)/2) over the (tiny, order-size-bounded)
    distinct count values. One key aggregate + one histogram aggregate;
    nothing global ever sorts more than |distinct counts| rows."""
    li = load_testdata(spark, sf_dir, tables=("lineitem",), register=False)["lineitem"]
    cnts = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("c"))
    hist = cnts.groupBy("c").agg(F.count(F.lit(1)).alias("f"))
    wc = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    terms = hist.select(
        "c",
        "f",
        F.coalesce(F.sum("f").over(wc), F.lit(0)).alias("r_prev"),
        F.sum(F.col("f")).over(Window.partitionBy()).alias("n"),
        F.sum(F.col("c") * F.col("f")).over(Window.partitionBy()).alias("s1"),
    )
    agg = terms.select(
        "n",
        "s1",
        (
            F.col("c")
            * (F.col("f") * F.col("r_prev") + F.expr("(f * (f + 1)) div 2"))
        ).alias("t"),
        F.when(F.col("r_prev") * 2 < F.col("n"), F.col("c")).alias("p50_c"),
        F.when(F.col("r_prev") * 100 < F.col("n") * 99, F.col("c")).alias("p99_c"),
        F.col("c").alias("mx"),
    ).groupBy("n", "s1").agg(
        F.sum("t").alias("t"),
        F.max("p50_c").alias("p50_rows"),
        F.max("p99_c").alias("p99_rows"),
        F.max("mx").alias("max_rows"),
    )
    return agg.select(
        F.col("n").alias("n_keys"),
        F.col("s1").alias("total_rows"),
        "p50_rows",
        "p99_rows",
        "max_rows",
        F.expr("(10000 * (2 * t - (n + 1) * s1)) div (n * s1)").alias("gini_bp"),
    )


QUERIES.update(
    {
        "ext_int_cosine_topk": int_cosine_topk,
        "ext_hybrid_rrf_search": hybrid_rrf_search,
        "ext_value_psi_drift": value_psi_drift,
        "t19_daily_zscore_anomalies": daily_zscore_anomalies,
        "t19_orderkey_skew_profile": orderkey_skew_profile,
    }
)


_ORACLE_COS = """
        WITH iv AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0, 0) AS BIGINT)) AS v
            FROM embeddings
        ),
        nv AS (
            SELECT vec_id, v,
                   CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS nrm
            FROM iv
        )
"""

ORACLE.update(
    {
        "ext_int_cosine_topk": _ORACLE_COS
        + f"""
        , scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   CAST(round(1000000.0 * CAST(list_sum(list_transform(
                           generate_series(1, len(q.v)),
                           i -> q.v[i] * c.v[i])) AS DOUBLE)
                       / (sqrt(CAST(q.nrm AS DOUBLE)) * sqrt(CAST(c.nrm AS DOUBLE))),
                       0) AS BIGINT) AS cos_micro
            FROM nv q JOIN nv c ON q.vec_id < {_COS_QUERY_IDS}
                 AND q.vec_id <> c.vec_id
        )
        SELECT query_id, neighbor_id, cos_micro, CAST(rank AS INT) AS rank FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cos_micro DESC, neighbor_id ASC) AS rank
            FROM scored)
        WHERE rank <= {_COS_K}
        ORDER BY query_id, rank
        """,
        "ext_value_psi_drift": """
            WITH ev AS (
                SELECT event_type, epoch_us(ts) AS ts_us,
                       least(255, (CAST(round(value * 1000000.0, 0) AS BIGINT) * 256)
                             // 600000000) AS b
                FROM events
            ),
            span AS (SELECT (MIN(ts_us) + MAX(ts_us)) // 2 AS mid FROM ev),
            halves AS (
                SELECT event_type, b,
                       CASE WHEN ts_us < mid THEN 1 ELSE 0 END AS is_a
                FROM ev CROSS JOIN span
            ),
            counts AS (SELECT event_type, b, CAST(SUM(is_a) AS BIGINT) AS n_a,
                              CAST(SUM(1 - is_a) AS BIGINT) AS n_b
                       FROM halves GROUP BY 1, 2),
            tot AS (SELECT event_type, CAST(SUM(n_a) AS BIGINT) AS tot_a,
                           CAST(SUM(n_b) AS BIGINT) AS tot_b
                    FROM counts GROUP BY 1),
            grid AS (SELECT event_type, tot_a, tot_b, unnest(generate_series(0, 255)) AS b
                     FROM tot),
            cells AS (
                SELECT g.event_type, g.tot_a, g.tot_b,
                       COALESCE(c.n_a, 0) AS n_a, COALESCE(c.n_b, 0) AS n_b, g.b
                FROM grid g LEFT JOIN counts c
                     ON g.event_type = c.event_type AND g.b = c.b
            )
            SELECT event_type, tot_a AS n_first_half, tot_b AS n_second_half,
                   CAST(SUM(CAST(round(
                       1000000.0
                       * (CAST(n_a + 1 AS DOUBLE) / CAST(tot_a + 256 AS DOUBLE)
                          - CAST(n_b + 1 AS DOUBLE) / CAST(tot_b + 256 AS DOUBLE))
                       * ln((CAST(n_a + 1 AS DOUBLE) / CAST(tot_a + 256 AS DOUBLE))
                            / (CAST(n_b + 1 AS DOUBLE) / CAST(tot_b + 256 AS DOUBLE))),
                       0) AS BIGINT)) AS BIGINT) AS psi_micro
            FROM cells
            GROUP BY 1, 2, 3
            ORDER BY 1
        """,
        "t19_daily_zscore_anomalies": """
            WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS day FROM events),
            daily AS (SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
                      FROM ev GROUP BY 1, 2),
            span AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM ev),
            types AS (SELECT DISTINCT event_type FROM ev),
            grid AS (SELECT event_type, CAST(unnest(generate_series(lo, hi,
                         INTERVAL 1 DAY)) AS DATE) AS day
                     FROM types CROSS JOIN span),
            dense AS (
                SELECT g.event_type, g.day, COALESCE(d.x, 0) AS x
                FROM grid g LEFT JOIN daily d
                     ON g.event_type = d.event_type AND g.day = d.day
            ),
            flagged AS (
                SELECT event_type, day, x,
                       COUNT(*) OVER w AS wn,
                       CAST(SUM(x) OVER w AS BIGINT) AS s,
                       CAST(SUM(x * x) OVER w AS BIGINT) AS ss
                FROM dense
                WINDOW w AS (PARTITION BY event_type ORDER BY day
                             ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
            )
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(CASE WHEN wn = 7 AND
                       (7 * x - s) * (7 * x - s) > 4 * (7 * ss - s * s)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
                   CAST(MAX(x) AS BIGINT) AS max_daily
            FROM flagged
            GROUP BY 1
            ORDER BY 1
        """,
        "t19_orderkey_skew_profile": """
            WITH cnts AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS c
                          FROM lineitem GROUP BY 1),
            hist AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS f FROM cnts GROUP BY 1),
            terms AS (
                SELECT c, f,
                       CAST(COALESCE(SUM(f) OVER (ORDER BY c
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                           AS BIGINT) AS r_prev,
                       CAST(SUM(f) OVER () AS BIGINT) AS n,
                       CAST(SUM(c * f) OVER () AS BIGINT) AS s1
                FROM hist
            )
            SELECT n AS n_keys, s1 AS total_rows,
                   CAST(MAX(CASE WHEN r_prev * 2 < n THEN c END) AS BIGINT) AS p50_rows,
                   CAST(MAX(CASE WHEN r_prev * 100 < n * 99 THEN c END) AS BIGINT)
                       AS p99_rows,
                   CAST(MAX(c) AS BIGINT) AS max_rows,
                   CAST((10000 * (2 * SUM(c * (f * r_prev + (f * (f + 1)) // 2))
                         - (n + 1) * s1)) // (n * s1) AS BIGINT) AS gini_bp
            FROM terms
            GROUP BY n, s1
        """,
    }
)

# RRF oracle: the SQL re-runs BOTH legs (BM25 at depth 20 + integer-
# cosine at depth 20) and fuses — no baked constants.
from bigdatamanagement_spark.queries.extensions import BM25_QUERY as _RRF_TERMS

_RRF_TERMS_SQL = ", ".join(f"'{t}'" for t in _RRF_TERMS)

ORACLE["ext_hybrid_rrf_search"] = f"""
    WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
               FROM documents),
    dl AS (SELECT doc_id, len(toks) AS dl FROM t),
    stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
    occ AS (SELECT doc_id, unnest(toks) AS term FROM t),
    dt AS (SELECT doc_id, term, COUNT(*) AS tf FROM occ
           WHERE term IN ({_RRF_TERMS_SQL}) GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(*) AS df FROM dt GROUP BY 1),
    contrib AS (
        SELECT dt.doc_id,
               CAST(round(CAST(1000000.0 AS DOUBLE)
                    * ln(CAST(1.0 AS DOUBLE)
                         + (n_docs - df + CAST(0.5 AS DOUBLE))
                           / (df + CAST(0.5 AS DOUBLE)))
                    * (tf * CAST(2.2 AS DOUBLE))
                    / (tf + CAST(1.2 AS DOUBLE)
                       * (CAST(0.25 AS DOUBLE)
                          + CAST(0.75 AS DOUBLE)
                            * (dl / (CAST(sum_dl AS DOUBLE) / n_docs)))), 0)
                    AS BIGINT) AS c
        FROM dt JOIN dfreq USING (term) JOIN dl USING (doc_id), stats
    ),
    lexs AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS score_micro
             FROM contrib GROUP BY doc_id),
    lex AS (SELECT doc_id, lex_rank FROM (
                SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score_micro DESC,
                    doc_id ASC) AS lex_rank FROM lexs)
            WHERE lex_rank <= {_RRF_DEPTH}),
    iv AS (SELECT vec_id, list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0, 0) AS BIGINT)) AS v
           FROM embeddings),
    nv AS (SELECT vec_id, v,
                  CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS nrm
           FROM iv),
    sems AS (
        SELECT c.vec_id AS doc_id,
               CAST(round(1000000.0 * CAST(list_sum(list_transform(
                       generate_series(1, len(q.v)), i -> q.v[i] * c.v[i])) AS DOUBLE)
                   / (sqrt(CAST(q.nrm AS DOUBLE)) * sqrt(CAST(c.nrm AS DOUBLE))),
                   0) AS BIGINT) AS cos_micro
        FROM nv q JOIN nv c ON q.vec_id = {_RRF_QVEC_ID} AND c.vec_id <> {_RRF_QVEC_ID}
    ),
    sem AS (SELECT doc_id, sem_rank FROM (
                SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cos_micro DESC,
                    doc_id ASC) AS sem_rank FROM sems)
            WHERE sem_rank <= {_RRF_DEPTH}),
    fused AS (
        SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
               CAST(lex.lex_rank AS INT) AS lex_rank,
               CAST(sem.sem_rank AS INT) AS sem_rank,
               CAST(COALESCE(1000000 // ({_RRF_K} + lex.lex_rank), 0)
                    + COALESCE(1000000 // ({_RRF_K} + sem.sem_rank), 0) AS BIGINT)
                   AS rrf_micro
        FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
    )
    SELECT doc_id, lex_rank, sem_rank, rrf_micro, CAST(rank AS INT) AS rank FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY rrf_micro DESC, doc_id ASC) AS rank
        FROM fused)
    WHERE rank <= 10
    ORDER BY rank
"""


# --- containment near-dup (quote / subset detection) ----------------------

_CONT_NUM, _CONT_DEN = 4, 5  # containment threshold 0.8
_CONT_MIN_SH = 5


def ngram_containment_pairs(
    spark: SparkSession, sf_dir: str, sampled: bool = False
) -> DataFrame:
    """EXT — DIRECTIONAL containment near-dup pairs: C(a→b) =
    |sh_a ∩ sh_b| / |sh_a| ≥ 4/5 (a's 3-word shingles mostly inside
    b's). Catches what symmetric Jaccard structurally misses: a short
    doc quoted inside a long one (the |union| denominator dilutes it).
    Portable 60-bit md5-slice shingle hashes (same construction as the
    oracle-checked SimHash entry); compare is exact integer.

    Scale: the contained side ships only its PREFIX — under a global
    shingle-frequency order, C(a→b) ≥ t forces a's first
    |sh_a| − ceil(t·|sh_a|) + 1 rarest shingles to hit b (the
    AllPairs bound applied one-sided); the container side indexes all
    its shingles. Candidates then verify by array intersection. The
    brute-force DuckDB oracle doubles as a completeness proof."""
    from bigdatamanagement_spark.operators.dedup import portable_shingle_hashes
    from bigdatamanagement_spark.queries.pipeline import SAMPLE_PRED

    d = _documents(spark, sf_dir)
    if sampled:
        d = d.filter(F.expr(SAMPLE_PRED))
    # Pinned: the shingle-hash table feeds four branches (df counts,
    # prefix + full occurrence sides, and both verify join-backs);
    # un-pinned, each branch re-ran the md5 shingle pipeline (the
    # optimizer fence correctly blocks subtree sharing).
    s = (
        portable_shingle_hashes(d, "doc_id", "text", 3)
        .filter(F.size("sh") >= _CONT_MIN_SH)
        .localCheckpoint()
    )
    tokf = (
        s.select(F.explode("sh").alias("hv"))
        .groupBy("hv")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    occ = s.select("doc_id", F.size("sh").alias("sz"), F.explode("sh").alias("hv"))
    wd = Window.partitionBy("doc_id").orderBy("df", "hv")
    pref = (
        occ.join(tokf, "hv")
        .select(
            "doc_id",
            "hv",
            F.row_number().over(wd).alias("pos"),
            F.expr(f"sz - ceil({_CONT_NUM} * sz / {_CONT_DEN}) + 1").alias("plen"),
        )
        .filter(F.col("pos") <= F.col("plen"))
        .select("hv", F.col("doc_id").alias("doc_a"))
    )
    full = occ.select("hv", F.col("doc_id").alias("doc_b"))
    cand = (
        pref.join(full, "hv")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    verified = (
        cand.join(s.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sa")), "doc_a")
        .join(s.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.expr("array_intersect(sa, sb)")).alias("inter"),
            F.size("sa").alias("size_a"),
        )
        .filter(F.col("inter") * _CONT_DEN >= _CONT_NUM * F.col("size_a"))
    )
    return verified.select(
        "doc_a",
        "doc_b",
        "inter",
        "size_a",
        F.expr("(10000 * inter) div size_a").alias("cont_bp"),
    ).orderBy("doc_a", "doc_b")


# --- bigram LM perplexity (CCNet-style quality filter) --------------------


def bigram_perplexity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT — per-source negative log-likelihood under an add-1-smoothed
    bigram LM trained on the whole corpus: the perplexity signal CCNet-
    style pipelines filter on (a source whose NLL spikes is out-of-
    domain or garbage). Each bigram occurrence's −ln((c(w1w2)+1)/
    (c(w1·)+V)) is rounded to integer micro-nats BEFORE any sum.

    Scale: bigram counts are ONE pair-keyed aggregate; occurrences
    re-join those counts on the same pair key (sort-merge co-location);
    the w1 marginal derives from the bigram table (no second corpus
    scan); V is a 1-row broadcast."""
    d = _documents(spark, sf_dir)
    toks = d.select("source", T.tokens(F.col("text")).alias("toks"))
    occ = toks.select(
        "source",
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.expr(
                    "transform(sequence(1, size(toks) - 1), i -> "
                    "struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))"
                ),
            ).otherwise(F.expr("array()"))
        ).alias("bg"),
    ).select("source", "bg.w1", "bg.w2")
    bc = occ.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_ab"))
    w1c = bc.groupBy("w1").agg(F.sum("c_ab").alias("c_a"))
    vocab = (
        d.select(F.explode(T.tokens(F.col("text"))).alias("t"))
        .agg(F.count_distinct("t").alias("v"))
    )
    p = (F.col("c_ab") + 1).cast("double") / (F.col("c_a") + F.col("v")).cast("double")
    term = F.round(F.lit(-1000000.0) * F.log(p), 0).cast("long")
    return (
        occ.join(bc, ["w1", "w2"])
        .join(w1c, "w1")
        .join(F.broadcast(vocab))
        .select("source", term.alias("nll"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("nll").alias("nll_micro"))
        .select(
            "source",
            "n_bigrams",
            "nll_micro",
            F.expr("nll_micro div n_bigrams").alias("mean_nll_micro"),
        )
        .orderBy("source")
    )


# --- inter-purchase intervals by segment ----------------------------------


def reorder_interval_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T19j — repeat-purchase cadence: per market segment, the exact
    median and p90 of days between a customer's consecutive orders.
    The replenishment signal behind inventory planning and churn
    windows. Customer dim joins BROADCAST (the TPC-H dim/fact shape);
    deltas come from one customer-keyed lag window; quantiles are
    order-stat crossings in whole days (no interpolation)."""
    o = load_testdata(spark, sf_dir, tables=("orders",), register=False)["orders"]
    c = load_testdata(spark, sf_dir, tables=("customer",), register=False)["customer"]
    wcust = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    deltas = (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.lag("o_orderdate").over(wcust).alias("prev_date"),
        )
        .filter(F.col("prev_date").isNotNull())
        .select(
            "o_custkey",
            "o_orderkey",
            F.datediff(F.to_date("o_orderdate"), F.to_date("prev_date")).cast(
                "long"
            ).alias("gap_days"),
        )
    )
    seg = deltas.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        deltas.o_custkey == F.col("c_custkey"),
    ).select("c_mktsegment", "o_custkey", "o_orderkey", "gap_days")
    wseg = Window.partitionBy("c_mktsegment").orderBy(
        "gap_days", "o_custkey", "o_orderkey"
    )
    ranked = seg.select(
        "c_mktsegment",
        "gap_days",
        F.row_number().over(wseg).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("c_mktsegment")).alias("n"),
    )
    med = (
        ranked.filter(F.col("rn") * 2 >= F.col("n"))
        .groupBy("c_mktsegment")
        .agg(F.min("gap_days").alias("med_gap_days"))
    )
    p90 = (
        ranked.filter(F.col("rn") * 10 >= F.col("n") * 9)
        .groupBy("c_mktsegment")
        .agg(F.min("gap_days").alias("p90_gap_days"))
    )
    base = seg.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n_intervals"))
    return (
        base.join(med, "c_mktsegment")
        .join(p90, "c_mktsegment")
        .orderBy("c_mktsegment")
    )


# --- revenue concentration (Pareto/ABC) -----------------------------------


def revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T19k — revenue-concentration profile: how many customers carry
    50% / 80% of total order revenue (exact cents). The ABC/Pareto
    skew check a partitioning or pricing analysis starts from.

    Scale: the global prefix sum over revenue-desc order runs as the
    TWO-PHASE distributed cumsum (operators/rank.py global_running_sum
    — range-repartition, per-partition sums to the driver, carry-in
    broadcast) — NEVER a bare one-task Window.orderBy. Head counts then
    fold from exact 2·run/5·run integer comparisons."""
    from bigdatamanagement_spark.operators.rank import global_running_sum

    o = load_testdata(spark, sf_dir, tables=("orders",), register=False)["orders"]
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("cents")
    )
    run = global_running_sum(
        rev, [F.col("cents").desc(), F.col("o_custkey").asc()], "cents", "run"
    )
    return _pareto_agg(run)


def _pareto_agg(run: DataFrame) -> DataFrame:
    tot = run.agg(F.sum("cents").alias("total_cents"))
    return (
        run.join(F.broadcast(tot))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("total_cents").alias("total_cents"),
            (F.sum(F.when(F.col("run") * 2 < F.col("total_cents"), 1).otherwise(0)) + 1)
            .alias("n_top50"),
            (F.sum(F.when(F.col("run") * 5 < F.col("total_cents") * 4, 1).otherwise(0)) + 1)
            .alias("n_top80"),
        )
    )


# --- event-type co-engagement overlap matrix ------------------------------


def event_type_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T19l — audience-overlap matrix: for each pair of event types,
    how many users did both, with the Jaccard overlap in floored bp.
    The co-engagement view behind feature bundling and funnel design.

    Scale: per-user type SETS from one user-keyed aggregate (type
    alphabet bounds the set), pair fan-out ≤ C(|types|,2) per user;
    per-type audience sizes broadcast back onto the tiny pair frame."""
    ev = _events(spark, sf_dir)
    ut = ev.select("user_id", "event_type").distinct()
    sets = ut.groupBy("user_id").agg(
        F.sort_array(F.collect_set("event_type")).alias("ts")
    )
    pairs = sets.select(
        F.explode(
            F.expr(
                "flatten(transform(ts, (x, i) -> "
                "transform(slice(ts, i + 2, size(ts)), "
                "y -> struct(x AS ta, y AS tb))))"
            )
        ).alias("p")
    ).select("p.ta", "p.tb")
    n_ab = pairs.groupBy("ta", "tb").agg(F.count(F.lit(1)).alias("n_both"))
    szs = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_users"))
    return (
        n_ab.join(F.broadcast(szs.withColumnRenamed("event_type", "ta")), "ta")
        .withColumnRenamed("n_users", "n_a")
        .join(
            F.broadcast(
                szs.withColumnRenamed("event_type", "tb").withColumnRenamed(
                    "n_users", "n_b"
                )
            ),
            "tb",
        )
        .select(
            "ta",
            "tb",
            "n_both",
            "n_a",
            "n_b",
            F.expr("(10000 * n_both) div (n_a + n_b - n_both)").alias("jacc_bp"),
        )
        .orderBy("ta", "tb")
    )


QUERIES.update(
    {
        "ext_ngram_containment_pairs": ngram_containment_pairs,
        "ext_bigram_perplexity_by_source": bigram_perplexity_by_source,
        "t19_reorder_interval_by_segment": reorder_interval_by_segment,
        "t19_revenue_pareto": revenue_pareto,
        "t19_event_type_overlap_matrix": event_type_overlap_matrix,
    }
)


_SHINGLES60 = (
    "list_distinct(list_transform("
    "list_transform(range(1, greatest(len(toks)-2, 0) + 1),"
    " i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]),"
    " s -> ('0x' || substring(md5(s), 1, 15))::BIGINT))"
)

ORACLE.update(
    {
        "ext_ngram_containment_pairs": f"""
            WITH t AS (
                SELECT doc_id, {_SHINGLES60} AS sh
                FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
            ),
            s AS (SELECT doc_id, sh FROM t WHERE len(sh) >= {_CONT_MIN_SH}),
            pairs AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       CAST(len(list_intersect(a.sh, b.sh)) AS INT) AS inter,
                       CAST(len(a.sh) AS INT) AS size_a
                FROM s a JOIN s b ON a.doc_id <> b.doc_id
            )
            SELECT doc_a, doc_b, inter, size_a,
                   CAST((10000 * inter) // size_a AS BIGINT) AS cont_bp
            FROM pairs
            WHERE inter * {_CONT_DEN} >= {_CONT_NUM} * size_a
            ORDER BY doc_a, doc_b
        """,
        "ext_bigram_perplexity_by_source": f"""
            WITH t AS (SELECT source, {_TOKS} AS toks FROM documents),
            occ AS (
                SELECT source, toks[i] AS w1, toks[i+1] AS w2
                FROM t, unnest(generate_series(1, len(toks) - 1)) AS g(i)
                WHERE len(toks) >= 2
            ),
            bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_ab
                   FROM occ GROUP BY 1, 2),
            w1c AS (SELECT w1, CAST(SUM(c_ab) AS BIGINT) AS c_a FROM bc GROUP BY 1),
            vocab AS (
                SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
                FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
            )
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                   CAST(SUM(CAST(round(-1000000.0 *
                       ln(CAST(c_ab + 1 AS DOUBLE) / CAST(c_a + v AS DOUBLE)),
                       0) AS BIGINT)) AS BIGINT) AS nll_micro,
                   CAST(SUM(CAST(round(-1000000.0 *
                       ln(CAST(c_ab + 1 AS DOUBLE) / CAST(c_a + v AS DOUBLE)),
                       0) AS BIGINT)) // COUNT(*) AS BIGINT) AS mean_nll_micro
            FROM occ
            JOIN bc USING (w1, w2)
            JOIN w1c USING (w1)
            CROSS JOIN vocab
            GROUP BY 1
            ORDER BY 1
        """,
        "t19_reorder_interval_by_segment": """
            WITH d AS (
                SELECT o_custkey, o_orderkey,
                       date_diff('day',
                           CAST(LAG(o_orderdate) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS DATE),
                           CAST(o_orderdate AS DATE)) AS gap_days
                FROM orders
            ),
            seg AS (
                SELECT c.c_mktsegment, d.o_custkey, d.o_orderkey,
                       CAST(d.gap_days AS BIGINT) AS gap_days
                FROM d JOIN customer c ON d.o_custkey = c.c_custkey
                WHERE d.gap_days IS NOT NULL
            ),
            r AS (SELECT c_mktsegment, gap_days,
                         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                             ORDER BY gap_days, o_custkey, o_orderkey) AS rn,
                         COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
                  FROM seg),
            med AS (SELECT c_mktsegment, CAST(MIN(gap_days) AS BIGINT) AS med_gap_days
                    FROM r WHERE rn * 2 >= n GROUP BY 1),
            p90 AS (SELECT c_mktsegment, CAST(MIN(gap_days) AS BIGINT) AS p90_gap_days
                    FROM r WHERE rn * 10 >= n * 9 GROUP BY 1),
            base AS (SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_intervals
                     FROM seg GROUP BY 1)
            SELECT base.c_mktsegment, base.n_intervals, med.med_gap_days,
                   p90.p90_gap_days
            FROM base JOIN med USING (c_mktsegment) JOIN p90 USING (c_mktsegment)
            ORDER BY 1
        """,
        "t19_revenue_pareto": """
            WITH rev AS (
                SELECT o_custkey,
                       CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                            AS BIGINT) AS cents
                FROM orders GROUP BY 1
            ),
            run AS (
                SELECT cents,
                       CAST(SUM(cents) OVER (ORDER BY cents DESC, o_custkey ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS BIGINT) AS run
                FROM rev
            ),
            tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS total_cents FROM rev)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
                   CAST(MIN(total_cents) AS BIGINT) AS total_cents,
                   CAST(SUM(CASE WHEN run * 2 < total_cents THEN 1 ELSE 0 END) + 1
                        AS BIGINT) AS n_top50,
                   CAST(SUM(CASE WHEN run * 5 < total_cents * 4 THEN 1 ELSE 0 END) + 1
                        AS BIGINT) AS n_top80
            FROM run CROSS JOIN tot
        """,
        "t19_event_type_overlap_matrix": """
            WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
            pairs AS (
                SELECT a.event_type AS ta, b.event_type AS tb,
                       CAST(COUNT(*) AS BIGINT) AS n_both
                FROM ut a JOIN ut b ON a.user_id = b.user_id
                     AND a.event_type < b.event_type
                GROUP BY 1, 2
            ),
            szs AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users
                    FROM ut GROUP BY 1)
            SELECT ta, tb, n_both, a.n_users AS n_a, b.n_users AS n_b,
                   CAST((10000 * n_both) // (a.n_users + b.n_users - n_both)
                        AS BIGINT) AS jacc_bp
            FROM pairs
            JOIN szs a ON pairs.ta = a.event_type
            JOIN szs b ON pairs.tb = b.event_type
            ORDER BY 1, 2
        """,
    }
)
