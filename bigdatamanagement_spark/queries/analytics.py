"""Advanced-analytics pack (T18/ext): RANGE-interval window frames,
decile banding (ntile + percent_rank), sliding distinct counts, IQR
outlier screening, chunk-level exact-substring dedup, deterministic
stratified + weighted (Efraimidis-Spirakis) sampling, UNPIVOT/melt,
token-pair PMI, portable Pearson/OLS/chi-square from exact BIGINT
moments, per-dimension embedding variance, debounce dedup, BPE
tokenizer train+apply, order-independent table checksums, event
lateness (watermark-sizing) profile, hourly session concurrency, and
session market-basket pair support.

These extend the reference's aggregation/window vocabulary (SURVEY §2.4,
§2.5 — Bigtable time-slice reads `Assignment 4/.../Bigtable.java:129-145`,
Redis leaderboard ranks `Assignment 5/redis_client.py:443`) with the
shapes a training-data/analytics pipeline needs that none of the seven
reference assignments cover: time-interval frames, banded rank stats,
sliding DISTINCT, robust outlier screens, span-level dedup, per-stratum
sampling, wide↔long reshape, and co-occurrence association scores.

Scale notes (100 TB):
- trailing-hour RANGE frame: ONE user-keyed shuffle; frame lookback is
  bounded by wall-clock (1 h), so per-row state is small regardless of
  total volume. Same shuffle key as the other t17 window queries —
  on a real pipeline these share one exchange.
- rolling 7-day distinct actives: sliding COUNT(DISTINCT) does not
  decompose into partial aggregates, so we EXPAND each (user, day)
  activity into the ≤7 window-ends it serves and count per window-end.
  Expansion factor is a constant 7 — linear, shuffle on day keys; the
  classic alternative (self-join days × 7-day activity ranges) shuffles
  the activity table 7× instead.
- decile banding: ntile needs a total order per type — per-group sort,
  acceptable because group count (event types) is small and AQE splits
  skewed groups; at extreme cardinality switch to approx-quantile cuts.
- chunk dedup: tokenize once, chunk narrowly (posexplode), hash to a
  32-byte digest BEFORE the chunk-keyed shuffle (ship digests, not
  text), then broadcast the (small) duplicated-chunk set back.
- stratified sample: deterministic hash-rank top-n per stratum — one
  shuffle on the stratum key, no RNG state, reproducible across runs
  and engines (the property reservoir sampling cannot give).
- PMI: vocabulary capped to top-50 by document frequency (broadcast),
  per-doc intersect is array work inside codegen; pair space ≤ C(50,2).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata

_HOUR_US = 3600 * 1000000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)["events"]


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("documents",), register=False)["documents"]


def trailing_hour_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T18a — RANGE-interval frame: per event, the sum/count of the same
    user's events in the trailing hour (inclusive). rangeBetween on
    unix_micros == RANGE BETWEEN <us> PRECEDING; peers (equal ts) share
    a frame on both engines, so no tiebreak column is needed."""
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-(_HOUR_US - 1), 0)
    )
    vmicro = F.round(F.col("value") * 1000000.0, 0).cast("long")
    return ev.select(
        "user_id",
        "event_id",
        F.sum(vmicro).over(w).alias("trailing_hr_micro"),
        F.count(F.lit(1)).over(w).alias("n_trailing"),
    ).orderBy("user_id", "event_id")


def value_decile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T18b — ntile(10) banding per event_type with exact percent_rank
    band edges in integer basis points (integer division: no float in
    the rank arithmetic, exact on both engines)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(F.col("value").asc(), F.col("event_id").asc())
    ranked = ev.select(
        "event_type",
        F.round(F.col("value") * 1000000.0, 0).cast("long").alias("vmicro"),
        F.ntile(10).over(w).alias("decile"),
        F.rank().over(w).alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("cnt"),
    )
    return (
        ranked.groupBy("event_type", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("vmicro").alias("sum_micro"),
            F.min(F.expr("(10000 * (rnk - 1)) div (cnt - 1)")).alias("lo_bp"),
            F.max(F.expr("(10000 * (rnk - 1)) div (cnt - 1)")).alias("hi_bp"),
        )
        .orderBy("event_type", "decile")
    )


def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T18c — trailing-7-day distinct active users per calendar day.
    Sliding COUNT(DISTINCT) does not merge from partials, so each
    (user, day) activity is expanded to the ≤7 window-end days it
    serves (constant fan-out), then counted per window-end over the
    full min..max day grid."""
    ev = _events(spark, sf_dir)
    acts = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    span = acts.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    grid = span.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    contrib = (
        acts.select(
            F.explode(F.sequence(F.col("day"), F.date_add("day", 6))).alias("w_day"),
            "user_id",
        )
        .distinct()
        .groupBy("w_day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        grid.join(contrib, grid.day == contrib.w_day, "left")
        .select(grid.day.alias("day"), F.coalesce("n", F.lit(0)).alias("active_users_7d"))
        .orderBy("day")
    )


def iqr_outlier_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T18d — Tukey-fence outlier screen per event_type: p25/p75 by
    linear interpolation (the definition Spark `percentile` and DuckDB
    `quantile_cont` share), fences at 1.5×IQR, count + bound the
    flagged tail. The fence compare is on raw doubles — both engines
    interpolate with the same formula on the same doubles."""
    ev = _events(spark, sf_dir)
    stats = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("p25"),
        F.percentile("value", F.lit(0.75)).alias("p75"),
    )
    fenced = ev.join(F.broadcast(stats), "event_type").withColumn(
        "is_out",
        (F.col("value") < F.col("p25") - 1.5 * (F.col("p75") - F.col("p25")))
        | (F.col("value") > F.col("p75") + 1.5 * (F.col("p75") - F.col("p25"))),
    )
    return (
        fenced.groupBy("event_type")
        .agg(
            F.round(F.first("p25"), 4).alias("p25"),
            F.round(F.first("p75"), 4).alias("p75"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("is_out").cast("long")).alias("n_outliers"),
            F.round(F.min(F.when(F.col("is_out"), F.col("value"))), 4).alias("min_outlier"),
            F.round(F.max(F.when(F.col("is_out"), F.col("value"))), 4).alias("max_outlier"),
        )
        .orderBy("event_type")
    )


CHUNK_TOKENS = 10


def chunk_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext — chunk-level exact-substring dedup (the scalable stand-in
    for suffix-array substring dedup, cf. Lee et al. "Deduplicating
    Training Data Makes Language Models Better"): split each document
    into consecutive 10-token chunks, hash each chunk, mark chunks
    whose exact text occurs in ≥2 distinct documents, report per-doc
    duplicated-span counts and the surviving token count."""
    docs = _documents(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.split(F.lower(F.trim("text")), "\\s+").alias("t")
    ).withColumn("n_chunks", (F.size("t") / CHUNK_TOKENS).cast("int"))
    # sequence(0, -1) DESCENDS in Spark (it's empty in DuckDB) — guard
    # zero-chunk docs explicitly so both engines drop them identically.
    chunks = toks.filter(F.col("n_chunks") > 0).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("n_chunks") - 1),
                lambda i: F.md5(
                    F.array_join(F.slice("t", i * CHUNK_TOKENS + 1, CHUNK_TOKENS), " ")
                ),
            )
        ).alias("chunk_no", "h"),
    )
    dup_set = (
        chunks.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    flagged = chunks.join(F.broadcast(dup_set.withColumn("dup", F.lit(1))), "h", "left")
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.coalesce("dup", F.lit(0))).alias("n_dup_chunks"),
        )
        .withColumn(
            "dup_bp", F.expr("(10000 * n_dup_chunks) div n_chunks")
        )
        .withColumn(
            "surviving_tokens",
            (F.col("n_chunks") - F.col("n_dup_chunks")) * CHUNK_TOKENS,
        )
        .orderBy("doc_id")
    )


SAMPLE_PER_STRATUM = 5


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext — deterministic stratified sampling: per (lang, source)
    stratum take the SAMPLE_PER_STRATUM docs with the smallest
    md5(doc_id) — a seedless, engine-portable reservoir: reproducible
    across runs, engines, and partitionings (true reservoir sampling
    is order-dependent and cannot be oracle-checked)."""
    docs = _documents(spark, sf_dir)
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    return (
        docs.select("lang", "source", "doc_id", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= SAMPLE_PER_STRATUM)
        .orderBy("lang", "source", "rnk")
    )


from bigdatamanagement_spark.queries.events import EVENT_TYPES


def unpivot_hourly_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext — UNPIVOT/melt: the hourly×type pivot matrix back to long
    form (hour_of_day, event_type, sum_value) including the explicit
    zero cells the wide form materializes — the wide↔long reshape
    round-trip over one Expand, no join."""
    from bigdatamanagement_spark.queries.events import hourly_type_pivot

    wide = hourly_type_pivot(spark, sf_dir)
    return (
        wide.unpivot("hour_of_day", EVENT_TYPES, "event_type", "sum_value")
        .orderBy("hour_of_day", "event_type")
    )


PMI_VOCAB = 50


def token_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext — pointwise mutual information over document-level token
    co-occurrence, vocabulary capped to the top-50 tokens by document
    frequency (deterministic: df DESC, token ASC). PMI in floored
    integer micro-nats (the KL-divergence precision convention).
    ln(N·c_xy/(c_x·c_y)) is evaluated on exact BIGINT ratios on both
    engines."""
    docs = _documents(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.array_distinct(F.split(F.lower(F.trim("text")), "\\s+")).alias("t")
    ).localCheckpoint()
    # Pinned: referenced three times (top-k vocab collect + both df
    # join-backs); un-pinned, each reference re-ran the explode +
    # aggregate over every token occurrence. O(|vocab|) rows.
    df_counts = (
        toks.select("doc_id", F.explode("t").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .localCheckpoint()
    )
    top = df_counts.orderBy(F.desc("df"), F.asc("token")).limit(PMI_VOCAB)
    vocab = [r["token"] for r in top.collect()]
    vocab_arr = F.array(*[F.lit(v) for v in sorted(vocab)])
    n_docs = docs.count()
    kept = toks.select(
        "doc_id", F.array_sort(F.array_intersect("t", vocab_arr)).alias("s")
    )
    pairs = (
        kept.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "s",
                        lambda x: F.filter(
                            F.transform("s", lambda y: F.struct(x.alias("x"), y.alias("y"))),
                            lambda st: st["x"] < st["y"],
                        ),
                    )
                )
            ).alias("p")
        )
        .select(F.col("p.x").alias("tok_a"), F.col("p.y").alias("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )
    dfs = df_counts.withColumnRenamed("token", "tok").withColumnRenamed("df", "c")
    return (
        pairs.join(F.broadcast(dfs.withColumnRenamed("tok", "tok_a").withColumnRenamed("c", "c_x")), "tok_a")
        .join(F.broadcast(dfs.withColumnRenamed("tok", "tok_b").withColumnRenamed("c", "c_y")), "tok_b")
        .select(
            "tok_a",
            "tok_b",
            "c_xy",
            F.floor(
                F.log(F.lit(float(n_docs)) * F.col("c_xy") / (F.col("c_x") * F.col("c_y")))
                * 1000000.0
            ).cast("long").alias("pmi_micro"),
        )
        .orderBy("tok_a", "tok_b")
    )


WEIGHTED_SAMPLE_K = 20


def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext — weighted sampling without replacement (Efraimidis-Spirakis
    A-Res): each doc draws u ∈ (0,1) from a seedless md5 slice and is
    ranked by ln(u)/weight (monotone in u^(1/w)); the global top-k is
    an exact weighted sample, reproducible across engines, runs, and
    partitionings. Distributed form: per-partition top-k then merge —
    TakeOrderedAndProject, no global sort."""
    docs = _documents(spark, sf_dir)
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    score = F.log(u) / F.col("n_chars")
    ranked = docs.select(
        "doc_id", F.col("n_chars").alias("weight"), score.alias("score")
    ).orderBy(F.desc("score"), F.asc("doc_id")).limit(WEIGHTED_SAMPLE_K)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return ranked.select(
        F.row_number().over(w).alias("rank"), "doc_id", "weight"
    ).orderBy("rank")


def corr_value_vs_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T18e — portable Pearson correlation per event_type between the
    event value (centi-scaled) and the JSON prop k: the five moments
    are EXACT BIGINT sums (order-proof), the closed form runs on
    doubles only at the very end. The shape `corr()` compiles to, made
    cross-engine exact."""
    ev = _events(spark, sf_dir)
    x = F.round(F.col("value") * 100.0, 0).cast("long")
    y = F.get_json_object("props", "$.k").cast("long")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n").cast("double") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n").cast("double") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(
        "event_type",
        "n",
        F.round(num.cast("double") / den, 6).alias("pearson_r"),
    ).orderBy("event_type")


def chi2_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext — chi-square independence test on the lang × source
    contingency table (is the language mix uniform across sources?).
    Expected counts from exact integer marginals; each cell's
    (O−E)²/E is floored to integer micros BEFORE the sum, so the
    statistic is aggregation-order-proof. One scan + tiny broadcast
    marginals."""
    docs = _documents(spark, sf_dir)
    cells = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    rows = cells.groupBy("lang").agg(F.sum("o").alias("row_tot"))
    cols = cells.groupBy("source").agg(F.sum("o").alias("col_tot"))
    n = docs.count()
    e = F.col("row_tot") * F.col("col_tot") / F.lit(float(n))
    cell_chi = F.floor((F.col("o") - e) * (F.col("o") - e) / e * 1000000.0).cast("long")
    joined = cells.join(F.broadcast(rows), "lang").join(F.broadcast(cols), "source")
    n_langs = rows.count()
    n_sources = cols.count()
    return joined.agg(F.sum(cell_chi).alias("chi2_micro")).select(
        F.lit(n).cast("long").alias("n_docs"),
        F.lit((n_langs - 1) * (n_sources - 1)).cast("long").alias("dof"),
        "chi2_micro",
    )


def source_bigram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext — pairwise source-level corpus overlap: Jaccard similarity
    of each source pair's distinct token-BIGRAM sets, in floored basis
    points (the corpus-drift / source-contamination monitor; unigram
    vocab is too small to discriminate). One (source, bigram) distinct
    shuffle; the pair join runs on the bigram key with source sizes
    broadcast back."""
    docs = _documents(spark, sf_dir)
    toks = docs.select(
        "source", F.split(F.lower(F.trim("text")), "\\s+").alias("t")
    )
    bigrams = toks.select(
        "source",
        F.explode(
            F.zip_with(
                F.slice("t", 1, F.greatest(F.size("t") - 1, F.lit(0))),
                F.slice("t", 2, F.greatest(F.size("t") - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bg"),
    ).distinct()
    sizes = bigrams.groupBy("source").agg(F.count(F.lit(1)).alias("sz"))
    a, b = bigrams.alias("a"), bigrams.alias("b")
    inter = (
        a.join(b, (F.col("a.bg") == F.col("b.bg")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(F.broadcast(sizes.withColumnRenamed("source", "src_a").withColumnRenamed("sz", "sz_a")), "src_a")
        .join(F.broadcast(sizes.withColumnRenamed("source", "src_b").withColumnRenamed("sz", "sz_b")), "src_b")
        .select(
            "src_a",
            "src_b",
            "inter",
            (F.col("sz_a") + F.col("sz_b") - F.col("inter")).alias("uni"),
            F.expr("(10000 * inter) div (sz_a + sz_b - inter)").alias("jaccard_bp"),
        )
        .orderBy("src_a", "src_b")
    )


def embedding_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext — per-dimension mean/variance of the embedding column: the
    feature-health profile of a vector corpus (dead dims, scale drift
    before ANN indexing). Values are micro-quantized to exact BIGINT
    moment sums (posexplode is narrow — no shuffle until the 64-key
    dim aggregate); the sample-variance closed form runs on doubles
    only at the end, mirrored exactly in SQL."""
    emb = load_testdata(spark, sf_dir, tables=("embeddings",), register=False)[
        "embeddings"
    ]
    x = F.round(F.col("v") * 1000000.0, 0).cast("long")
    m = (
        emb.select(F.posexplode("embedding").alias("dim0", "v"))
        .select((F.col("dim0") + 1).alias("dim"), x.alias("x"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    # Exact-integer end to end: n·Σx² − (Σx)² fits BIGINT through sf0.1
    # (~1.4e18 at 2000 vectors); at cluster scale switch the moments to
    # DECIMAL(38,0) — a double formula here is NOT cross-engine stable
    # (the ~1e10-magnitude variance renders at 6 significant digits,
    # and a 1-ulp division difference flips the rounding midpoint).
    return m.select(
        F.col("dim").cast("long").alias("dim"),
        "n",
        F.expr(
            "CASE WHEN sx >= 0 THEN sx div n ELSE -((-sx + n - 1) div n) END"
        ).alias("mean_micro_floor"),
        F.expr("(n * sxx - sx * sx) div (n * (n - 1))").alias("var_micro2_floor"),
    ).orderBy("dim")


def ols_value_on_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T18f — per-group simple linear regression (value ~ props.k):
    slope in EXACT integer centi-units ((100·num) div den on BIGINT
    moments — micro would overflow 64 bits), intercept via a pinned
    double op sequence mirrored in SQL. The trend-fit companion to the
    Pearson query, same one-pass moment aggregate."""
    ev = _events(spark, sf_dir)
    x = F.get_json_object("props", "$.k").cast("long")
    y = F.round(F.col("value") * 100.0, 0).cast("long")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    return m.select(
        "event_type",
        "n",
        F.expr(
            "CASE WHEN 100 * (n * sxy - sx * sy) >= 0"
            " THEN (100 * (n * sxy - sx * sy)) div (n * sxx - sx * sx)"
            " ELSE -((-(100 * (n * sxy - sx * sy)) + (n * sxx - sx * sx) - 1)"
            "        div (n * sxx - sx * sx)) END"
        ).alias("slope_centi_floor"),
        F.round(
            (
                F.col("sy").cast("double")
                - (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
                / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
                * F.col("sx").cast("double")
            )
            / F.col("n").cast("double"),
            4,
        ).alias("intercept_centi"),
    ).orderBy("event_type")


DEBOUNCE_US = 5 * 60 * 1000000


def event_debounce_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T18g — debounce dedup: an event is kept iff it is the first of
    its (user, event_type) or arrives > 5 min after the PREVIOUS RAW
    event of that key (lag-based debounce — the one-window form; a
    keep-relative-to-last-KEPT throttle is inherently sequential and
    lives in the stateful streaming operator instead). One key-ordered
    shuffle, same exchange as the other per-user windows."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = (us - F.lag(us).over(w)).alias("gap_us")
    # kept derives from gap in a second select so the lag computes once
    flagged = ev.select("event_type", gap).withColumn(
        "kept", F.col("gap_us").isNull() | (F.col("gap_us") > DEBOUNCE_US)
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
            F.min(F.when(~F.col("kept"), F.col("gap_us"))).alias("min_dropped_gap_us"),
            F.max(F.when(~F.col("kept"), F.col("gap_us"))).alias("max_dropped_gap_us"),
        )
        .orderBy("event_type")
    )


BPE_ROUNDS = 6

_BPE_MERGES_MEMO: dict[tuple[str, str], list] = {}

_BPE_MERGES_SCHEMA = (
    "round INT, sym_a STRING, sym_b STRING, merged STRING, cnt BIGINT"
)


def _bpe_merges_rows(spark: SparkSession, sf_dir: str) -> list[list]:
    """The trained 6-round merge table as driver-side rows — the
    tokenizer MODEL (KBs by definition), memoized per (session, corpus)
    exactly like the trained SemDeDup centroids: training is the
    expensive phase (a 6-round argmax chain — each round a broadcast
    wave over the vocabulary) and in production happens once at
    tokenizer-build time, while BOTH ext_bpe_merge_table and
    ext_bpe_encode_summary consume the result. persistent_json routes
    through the fresh-mode scratch root, so bench/oracle runs always
    retrain from the parquet inputs once per invocation."""
    from bigdatamanagement_spark import cache
    from bigdatamanagement_spark.operators.bpe import bpe_train
    from bigdatamanagement_spark.session import session_key

    key = (session_key(spark), sf_dir)
    if key not in _BPE_MERGES_MEMO:

        def build() -> list[list]:
            docs = _documents(spark, sf_dir)
            vocab = (
                docs.select(
                    F.explode(
                        F.split(F.lower(F.trim("text")), "\\s+")
                    ).alias("token")
                )
                .groupBy("token")
                .agg(F.count(F.lit(1)).alias("freq"))
            )
            return [
                [r["round"], r["sym_a"], r["sym_b"], r["merged"], r["cnt"]]
                for r in bpe_train(vocab, rounds=BPE_ROUNDS).collect()
            ]

        _BPE_MERGES_MEMO[key] = cache.persistent_json(
            "bpe_merges", sf_dir, ("documents",), f"rounds={BPE_ROUNDS} v1", build
        )
    return _BPE_MERGES_MEMO[key]


def bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext — BPE tokenizer training over the corpus vocabulary: the
    first 6 merge rounds (operators/bpe.py), each round's winning
    adjacent-symbol pair chosen by weighted frequency with
    deterministic ties. The TRAIN side of the tokenizer surface; token
    counting in operators/text.py is the APPLY side. The trained table
    is served from the per-(session, corpus) model memo
    (_bpe_merges_rows) — same rows, types and order as the direct
    bpe_train plan (pinned in tests)."""
    rows = _bpe_merges_rows(spark, sf_dir)
    return spark.createDataFrame(
        [tuple(r) for r in rows], _BPE_MERGES_SCHEMA
    ).orderBy("round")


def table_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext — order-independent table integrity digests: per table, the
    row count plus a bit_xor of 60-bit md5 slices of the canonical row
    string. XOR aggregation is commutative/associative, so the digest
    is identical under ANY partitioning, task order, or engine — the
    primitive for verifying replica/migration equality at 100 TB
    without moving data (each side computes locally, compares 8
    bytes). Null-vs-empty disambiguated with a sentinel (the corpus
    snapshot-diff convention)."""
    # Canonical row strings use only STRING and BIGINT projections —
    # double→string and timestamp→string formatting is engine-specific
    # (trailing zeros, exponent forms), integers are not.
    docs = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("c1"),
        F.col("text").alias("c2"),
        F.col("lang").alias("c3"),
        F.col("source").alias("c4"),
        F.col("n_chars").cast("string").alias("c5"),
    )
    ev = _events(spark, sf_dir).select(
        F.col("event_id").cast("string").alias("c1"),
        F.unix_micros(F.col("ts").cast("timestamp")).cast("string").alias("c2"),
        F.col("user_id").cast("string").alias("c3"),
        F.col("event_type").alias("c4"),
        F.round(F.col("value") * 1000000.0, 0).cast("long").cast("string").alias("c5"),
    )

    def digest(df: DataFrame, name: str) -> DataFrame:
        canon = F.concat_ws(
            "|", *[F.coalesce(F.col(c), F.lit("\x00NULL")) for c in df.columns]
        )
        h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"), F.bit_xor(h).alias("xor_digest")
        ).select(F.lit(name).alias("table_name"), "n_rows", "xor_digest")

    return digest(docs, "documents").unionAll(digest(ev, "events")).orderBy("table_name")


def bpe_encode_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext — tokenizer APPLY: encode the whole corpus with the 6 merges
    learned by ext_bpe_merge_table and report per-source token vs piece
    counts (pieces < chars: the compression the tokenizer buys). The
    merge table is the model — collected (KBs) and folded as literal
    replaces in one narrow map; train→apply end-to-end is oracle-checked
    with the oracle RE-LEARNING the merges in SQL."""
    from bigdatamanagement_spark.operators.bpe import bpe_apply

    merges = bpe_merge_table(spark, sf_dir)
    docs = _documents(spark, sf_dir)
    enc = bpe_apply(docs, merges)
    return (
        enc.select(
            "source",
            F.size(F.split(F.lower(F.trim("text")), "\\s+")).alias("nt"),
            "n_pieces",
        )
        .groupBy("source")
        .agg(
            F.sum("nt").cast("long").alias("n_tokens"),
            F.sum("n_pieces").cast("long").alias("total_pieces"),
        )
        .orderBy("source")
    )


LATE_US = 30 * 60 * 1000000


def event_lateness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T18h — out-of-orderness profile: per event_type, how far behind
    the high-water-mark (max event time seen so far in ARRIVAL order,
    proxied by event_id) each event arrives — the measurement that
    justifies a streaming watermark delay. The global running max uses
    the two-phase range-repartition shape (operators/rank.py), never a
    one-task Window.orderBy."""
    from bigdatamanagement_spark.operators.rank import global_running_max

    ev = _events(spark, sf_dir).select(
        "event_id", "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    hwm = global_running_max(ev, "event_id", "us", "hwm_us")
    late = hwm.withColumn("lateness_us", F.col("hwm_us") - F.col("us"))
    return (
        late.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("lateness_us") > LATE_US).cast("long")).alias("n_late_30m"),
            F.max("lateness_us").alias("max_lateness_us"),
        )
        .orderBy("event_type")
    )


SESSION_GAP_S = 1800


def concurrent_sessions_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T18i — interval-concurrency analytics: how many user sessions
    (30-min-gap sessionization) are ACTIVE in each hour — the capacity-
    planning view over session intervals. Each session expands to the
    hours it covers (fan-out bounded by session duration, not corpus
    size) and one hour-keyed count aggregates; no global sweep-line
    ordering needed at hour granularity."""
    from bigdatamanagement_spark.operators.sessionize import sessionize

    ev = _events(spark, sf_dir)
    sess = (
        sessionize(ev, "user_id", "ts", SESSION_GAP_S, order_tiebreak="event_id")
        .groupBy("user_id", "session_seq")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    hours = sess.select(
        F.explode(
            F.sequence(
                F.date_trunc("hour", "s_start"),
                F.date_trunc("hour", "s_end"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hr")
    )
    return (
        hours.groupBy(F.col("hr").cast("timestamp_ntz").alias("hr"))
        .agg(F.count(F.lit(1)).alias("n_active_sessions"))
        .orderBy("hr")
    )


def session_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T18j — market-basket over sessions: support counts of event-TYPE
    pairs co-occurring within one user session (30-min gap), in floored
    basis points of all sessions — the association-mining shape
    (Agrawal/Srikant Apriori's pair level) on behavioral data. Each
    session reduces to its distinct type SET (≤5 types ⇒ ≤10 pairs per
    session: bounded fan-out), one session-keyed aggregate + one pair
    count."""
    from bigdatamanagement_spark.operators.sessionize import sessionize

    ev = _events(spark, sf_dir)
    sess_types = (
        sessionize(ev, "user_id", "ts", SESSION_GAP_S, order_tiebreak="event_id")
        .groupBy("user_id", "session_seq")
        .agg(F.array_sort(F.collect_set("event_type")).alias("types"))
    )
    n_sessions = sess_types.count()
    singles = (
        sess_types.select(F.explode("types").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n_t"))
    )
    pairs = (
        sess_types.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "types",
                        lambda x: F.filter(
                            F.transform(
                                "types", lambda y: F.struct(x.alias("a"), y.alias("b"))
                            ),
                            lambda st: st["a"] < st["b"],
                        ),
                    )
                )
            ).alias("p")
        )
        .groupBy(F.col("p.a").alias("type_a"), F.col("p.b").alias("type_b"))
        .agg(F.count(F.lit(1)).alias("n_sessions_with_pair"))
    )
    # support / confidence(a→b) / lift — all exact integer arithmetic
    return (
        pairs.join(
            F.broadcast(singles.withColumnRenamed("t", "type_a").withColumnRenamed("n_t", "n_a")),
            "type_a",
        )
        .join(
            F.broadcast(singles.withColumnRenamed("t", "type_b").withColumnRenamed("n_t", "n_b")),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "n_sessions_with_pair",
            F.expr(f"(10000 * n_sessions_with_pair) div {n_sessions}").alias("support_bp"),
            F.expr("(10000 * n_sessions_with_pair) div n_a").alias("confidence_bp"),
            F.expr(
                f"(1000000 * cast({n_sessions} as bigint) * n_sessions_with_pair)"
                " div (n_a * n_b)"
            ).alias("lift_micro"),
        )
        .orderBy("type_a", "type_b")
    )


def weighted_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T18k — exact weighted median per event_type (weight = props.k):
    the smallest value whose cumulative weight reaches half the total —
    one key-ordered window cumsum + a per-group min, all exact BIGINT
    (2·cum ≥ total avoids halving fractions). The robust-center
    statistic percentile_cont cannot express with weights."""
    ev = _events(spark, sf_dir)
    w = F.get_json_object("props", "$.k").cast("long")
    rows = ev.select(
        "event_type",
        F.round(F.col("value") * 1000000.0, 0).cast("long").alias("vmicro"),
        w.alias("wt"),
    ).filter(F.col("wt") > 0)
    win = Window.partitionBy("event_type").orderBy(
        F.col("vmicro").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = Window.partitionBy("event_type")
    cum = rows.select(
        "event_type",
        "vmicro",
        F.sum("wt").over(win).alias("cum_wt"),
        F.sum("wt").over(tot).alias("tot_wt"),
    )
    return (
        cum.filter(2 * F.col("cum_wt") >= F.col("tot_wt"))
        .groupBy("event_type")
        .agg(
            F.min("vmicro").alias("wmedian_micro"),
            F.max("tot_wt").alias("total_weight"),
        )
        .orderBy("event_type")
    )


def portable_hll_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext — portable HyperLogLog distinct-user estimate per event_type
    vs the exact count (operators/sketch.portable_hll_distinct): the
    engine-checkable twin of t17_approx_distinct_users_by_type (whose
    native HLL++ has no SQL mirror). Error bound pinned in tests."""
    from bigdatamanagement_spark.operators.sketch import portable_hll_distinct

    ev = _events(spark, sf_dir)
    est = portable_hll_distinct(ev, "user_id", ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return (
        exact.join(est, "event_type")
        .select("event_type", "exact_distinct", "hll_estimate")
        .orderBy("event_type")
    )


def hll_setops_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext — sketch ALGEBRA: estimate the user overlap between two
    behaviors without a distinct-join. Union of HLL sketches is
    register-wise MAX (exactly another groupBy-max over concatenated
    register tables — the mergeability that lets sketches combine
    across partitions, days, or datacenters); intersection by
    inclusion-exclusion on the integer estimates. Exact counts ride
    along to exhibit the error."""
    from bigdatamanagement_spark.operators.sketch import (
        hll_estimate_from_registers,
        portable_hll_registers,
    )

    ev = _events(spark, sf_dir)
    clickers = ev.filter(F.col("event_type") == "click").select("user_id")
    purchasers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    ra = portable_hll_registers(clickers, "user_id", [])
    rb = portable_hll_registers(purchasers, "user_id", [])
    ru = ra.unionAll(rb).groupBy("reg").agg(F.max("r").alias("r"))
    ea = hll_estimate_from_registers(ra, [], out_col="est_clickers")
    eb = hll_estimate_from_registers(rb, [], out_col="est_purchasers")
    eu = hll_estimate_from_registers(ru, [], out_col="est_union")
    exact = ev.agg(
        F.count_distinct(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("exact_clickers"),
        F.count_distinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("exact_purchasers"),
        F.count_distinct(
            F.when(
                F.col("event_type").isin("click", "purchase"), F.col("user_id")
            )
        ).alias("exact_union"),
    )
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .crossJoin(exact)
        .select(
            "est_clickers",
            "est_purchasers",
            "est_union",
            (
                F.col("est_clickers") + F.col("est_purchasers") - F.col("est_union")
            ).alias("est_intersection"),
            "exact_clickers",
            "exact_purchasers",
            "exact_union",
            (
                F.col("exact_clickers") + F.col("exact_purchasers") - F.col("exact_union")
            ).alias("exact_intersection"),
        )
    )


def rolling_7d_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext — the SKETCH path for sliding COUNT(DISTINCT): per-day HLL
    register tables (the at-ingest daily materialization — m rows/day)
    union register-wise across each trailing-7-day window, then
    estimate. Exact expansion (t18_rolling_7d_active_users) re-shuffles
    (user, day) activity; this shuffles m-row register tables — the
    90-day version costs the same per window-end. Fully oracle-checked
    because the sketch is the portable construction."""
    from bigdatamanagement_spark.operators.sketch import (
        hll_estimate_from_registers,
        portable_hll_registers,
    )

    ev = _events(spark, sf_dir)
    daily = portable_hll_registers(
        ev.select(F.to_date("ts").alias("day"), "user_id"), "user_id", ["day"]
    )
    span = ev.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    grid = span.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    win_regs = (
        daily.select(
            F.explode(F.sequence(F.col("day"), F.date_add("day", 6))).alias("w_day"),
            "reg",
            "r",
        )
        .groupBy("w_day", "reg")
        .agg(F.max("r").alias("r"))
    )
    est = hll_estimate_from_registers(win_regs, ["w_day"], out_col="hll_active_7d")
    return (
        grid.join(est, grid.day == est.w_day, "left")
        .select(
            grid.day.alias("day"),
            F.coalesce("hll_active_7d", F.lit(0)).alias("hll_active_7d"),
        )
        .orderBy("day")
    )


def twap_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T18l — time-weighted average value per event_type (the TWAP /
    LOCF-integral staple): each event's value holds until the type's
    next event; the average weights by holding duration, not by event
    count. Exact integers end-to-end: centi-value × micro-duration sums
    are bounded by value_range × TOTAL SPAN (≈1.5e17 here), independent
    of event count — the overflow analysis that makes the BIGINT form
    safe at any arrival rate. One type-keyed window (lead) + one
    aggregate."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    rows = ev.select(
        "event_type",
        F.round(F.col("value") * 100.0, 0).cast("long").alias("vc"),
        (F.lead(us).over(w) - us).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    return (
        rows.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("dur_us").alias("total_us"),
            F.expr("sum(vc * dur_us) div sum(dur_us)").alias("twap_centi"),
        )
        .orderBy("event_type")
    )


def top_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T18m — path mining one step past the Markov matrix: the top-20
    3-step event-type paths (A→B→C) across user journeys, with each
    path's share of all trigrams in floored basis points. Two lag
    columns over the SAME user-keyed window — one shuffle, same
    exchange as the whole behavioral family."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    tri = (
        ev.select(
            F.lag("event_type", 2).over(w).alias("t1"),
            F.lag("event_type", 1).over(w).alias("t2"),
            F.col("event_type").alias("t3"),
        )
        .filter(F.col("t1").isNotNull())
        .groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = tri.agg(F.sum("n")).collect()[0][0]
    return (
        tri.select(
            "t1", "t2", "t3", "n",
            F.expr(f"(10000 * n) div {total}").alias("share_bp"),
        )
        .orderBy(F.desc("n"), "t1", "t2", "t3")
        .limit(20)
    )


HASH_DIM = 64
KNUTH32 = 2654435761


def hashed_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext — APPLY a linear text classifier over hashed bag-of-words
    features (the fastText/VW hashing-trick shape): tokens hash into 64
    md5 buckets, the doc score is Σ count(bucket)·w(bucket), positive
    iff score > 0. The weight vector is a deterministic STUB model
    (Knuth-mixed bucket index → [-1000, 1000]) — training lives
    offline; the engine-side contract is the featurize+score plan,
    which is one explode + one doc-keyed aggregate with the model as a
    64-literal broadcast. Fully integer, fully oracle-checked."""
    docs = _documents(spark, sf_dir)
    tok = docs.select(
        "doc_id", "source", F.explode(F.split(F.lower(F.trim("text")), "\\s+")).alias("t")
    ).filter(F.col("t") != "")
    bucket = F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long") % HASH_DIM
    weight = (bucket * KNUTH32) % 2001 - 1000
    scored = (
        tok.select("doc_id", "source", (weight).alias("w"))
        .groupBy("doc_id", "source")
        .agg(F.sum("w").alias("score"))
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("score") > 0).cast("long")).alias("n_positive"),
            F.sum("score").alias("sum_score"),
        )
        .orderBy("source")
    )


def weekly_value_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T18n — period-over-period: weekly value totals per event_type
    with week-over-week delta in exact integer micros and floored
    basis points vs the prior week — the BI trend primitive, one
    type-keyed lag window over the weekly aggregate."""
    ev = _events(spark, sf_dir)
    wk = ev.groupBy(
        "event_type", F.date_trunc("week", "ts").cast("timestamp_ntz").alias("week_ts")
    ).agg(
        F.sum(F.round(F.col("value") * 1000000.0, 0).cast("long")).alias("sum_micro")
    )
    w = Window.partitionBy("event_type").orderBy("week_ts")
    return wk.select(
        "event_type",
        "week_ts",
        "sum_micro",
        (F.col("sum_micro") - F.lag("sum_micro").over(w)).alias("wow_delta_micro"),
        F.expr(
            "CASE WHEN lag(sum_micro) OVER (PARTITION BY event_type ORDER BY week_ts)"
            " IS NULL THEN NULL ELSE"
            " CASE WHEN 10000 * (sum_micro - lag(sum_micro) OVER"
            "   (PARTITION BY event_type ORDER BY week_ts)) >= 0"
            " THEN (10000 * (sum_micro - lag(sum_micro) OVER"
            "   (PARTITION BY event_type ORDER BY week_ts)))"
            "   div (lag(sum_micro) OVER (PARTITION BY event_type ORDER BY week_ts))"
            " ELSE -((-(10000 * (sum_micro - lag(sum_micro) OVER"
            "   (PARTITION BY event_type ORDER BY week_ts)))"
            "   + (lag(sum_micro) OVER (PARTITION BY event_type ORDER BY week_ts)) - 1)"
            "   div (lag(sum_micro) OVER (PARTITION BY event_type ORDER BY week_ts)))"
            " END END"
        ).alias("wow_delta_bp"),
    ).orderBy("event_type", "week_ts")


HIST_BUCKETS = 256
HIST_MAX_MICRO = 600 * 1000000  # value domain [0, 600) — fixed a priori


def histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext — quantiles from a MERGEABLE fixed-width histogram sketch:
    256 equi-width buckets over the known value domain, per-type
    counts, then p50/p90/p99 read off the cumulative histogram as the
    LOWER BOUND of the first bucket whose cumulative count crosses the
    rank (integer end-to-end — no interpolation float). The bucket
    table is 256 ints per group and merges by cell-wise sum, so the
    sketch combines across partitions/days like count-min; error is
    bounded by bucket width (600/256 ≈ 2.34), exhibited against the
    exact quantiles. This is the oracle-CHECKED face of quantiles at
    scale; the native approx_percentile (t-digest) entry stays
    rows-only."""
    ev = _events(spark, sf_dir)
    hist = (
        ev.select(
            "event_type",
            F.expr(
                f"least({HIST_BUCKETS - 1},"
                f" (cast(round(value * 1000000.0, 0) as bigint) * {HIST_BUCKETS})"
                f" div {HIST_MAX_MICRO})"
            ).alias("b"),
        )
        .groupBy("event_type", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "b",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(tot).alias("total"),
    )
    width = HIST_MAX_MICRO // HIST_BUCKETS

    def q_lb(p_num: int, p_den: int, name: str):
        crossing = cum.filter(
            F.col("cum") * p_den >= F.col("total") * p_num
        ).groupBy("event_type").agg((F.min("b") * width).alias(name))
        return crossing

    return (
        q_lb(1, 2, "p50_lb_micro")
        .join(q_lb(9, 10, "p90_lb_micro"), "event_type")
        .join(q_lb(99, 100, "p99_lb_micro"), "event_type")
        .orderBy("event_type")
    )


def top_users_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T18o — dense_rank top-k WITH ties: the top-3 per-user total-value
    ranks per event_type, keeping ALL users on a tied total (row_number
    and rank would silently drop or gap co-winners — the leaderboard
    semantics difference this query pins). Totals in exact micros so
    ties are exact, not float-accidental."""
    ev = _events(spark, sf_dir)
    totals = ev.groupBy("event_type", "user_id").agg(
        F.sum(F.round(F.col("value") * 1000000.0, 0).cast("long")).alias("total_micro")
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("total_micro"))
    return (
        totals.withColumn("dr", F.dense_rank().over(w))
        .filter(F.col("dr") <= 3)
        .select("event_type", F.col("dr").cast("int").alias("value_rank"),
                "user_id", "total_micro")
        .orderBy("event_type", "value_rank", "user_id")
    )


QUERIES = {
    "t18_top_users_with_ties": top_users_with_ties,
    "ext_histogram_quantiles": histogram_quantiles,
    "ext_hashed_classifier_scores": hashed_classifier_scores,
    "t18_weekly_value_deltas": weekly_value_deltas,
    "t18_top_event_trigrams": top_event_trigrams,
    "t18_twap_by_type": twap_by_type,
    "ext_rolling_7d_hll_users": rolling_7d_hll_users,
    "ext_hll_setops_click_purchase": hll_setops_click_purchase,
    "ext_portable_hll_users": portable_hll_users_by_type,
    "t18_weighted_median_value": weighted_median_value,
    "t18_session_basket_pairs": session_basket_pairs,
    "t18_concurrent_sessions_hourly": concurrent_sessions_hourly,
    "t18_event_lateness_profile": event_lateness_profile,
    "ext_bpe_encode_summary": bpe_encode_summary,
    "ext_table_checksums": table_checksums,
    "ext_bpe_merge_table": bpe_merge_table,
    "t18_ols_value_on_prop": ols_value_on_prop,
    "t18_event_debounce_summary": event_debounce_summary,
    "ext_embedding_dim_variance": embedding_dim_variance,
    "ext_weighted_sample": weighted_sample,
    "t18_corr_value_prop": corr_value_vs_prop,
    "ext_chi2_lang_source": chi2_lang_source,
    "ext_source_bigram_jaccard": source_bigram_jaccard,
    "t18_trailing_hour_value": trailing_hour_value,
    "t18_value_decile_bands": value_decile_bands,
    "t18_rolling_7d_active_users": rolling_7d_active_users,
    "t18_iqr_outlier_summary": iqr_outlier_summary,
    "ext_chunk_dup_spans": chunk_dup_spans,
    "ext_stratified_sample": stratified_sample,
    "ext_unpivot_hourly": unpivot_hourly_matrix,
    "ext_token_pmi_pairs": token_pmi_pairs,
}

from bigdatamanagement_spark.operators.bpe import (
    bpe_apply_oracle_sql as _bpe_apply_sql,
    bpe_oracle_sql as _bpe_sql,
)

_BPE_VOCAB_SQL = """
    SELECT token, COUNT(*) AS freq
    FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
          FROM documents)
    GROUP BY 1
"""

ORACLE = {
    "t18_top_users_with_ties": """
        WITH totals AS (
            SELECT event_type, user_id,
                   CAST(SUM(CAST(round(value * 1000000.0, 0) AS BIGINT)) AS BIGINT)
                       AS total_micro
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, CAST(dr AS INT) AS value_rank, user_id, total_micro
        FROM (SELECT *, DENSE_RANK() OVER (PARTITION BY event_type
                  ORDER BY total_micro DESC) AS dr FROM totals)
        WHERE dr <= 3
        ORDER BY event_type, value_rank, user_id
    """,
    "ext_histogram_quantiles": """
        WITH hist AS (
            SELECT event_type,
                   least(255, (CAST(round(value * 1000000.0, 0) AS BIGINT) * 256)
                              // 600000000) AS b,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        cum AS (
            SELECT event_type, b,
                   CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY b
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cum,
                   CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS total
            FROM hist
        ),
        p50 AS (SELECT event_type, CAST(MIN(b) * 2343750 AS BIGINT) AS p50_lb_micro
                FROM cum WHERE cum * 2 >= total * 1 GROUP BY 1),
        p90 AS (SELECT event_type, CAST(MIN(b) * 2343750 AS BIGINT) AS p90_lb_micro
                FROM cum WHERE cum * 10 >= total * 9 GROUP BY 1),
        p99 AS (SELECT event_type, CAST(MIN(b) * 2343750 AS BIGINT) AS p99_lb_micro
                FROM cum WHERE cum * 100 >= total * 99 GROUP BY 1)
        SELECT event_type, p50_lb_micro, p90_lb_micro, p99_lb_micro
        FROM p50 JOIN p90 USING (event_type) JOIN p99 USING (event_type)
        ORDER BY event_type
    """,
    "ext_hashed_classifier_scores": """
        WITH tok AS (
            SELECT doc_id, source,
                   unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
            FROM documents
        ),
        scored AS (
            SELECT doc_id, source,
                   CAST(SUM((('0x' || substring(md5(t), 1, 8))::BIGINT % 64)
                            * 2654435761 % 2001 - 1000) AS BIGINT) AS score
            FROM tok WHERE t <> '' GROUP BY 1, 2
        )
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_positive,
               CAST(SUM(score) AS BIGINT) AS sum_score
        FROM scored GROUP BY 1 ORDER BY 1
    """,
    "t18_weekly_value_deltas": """
        WITH wk AS (
            SELECT event_type, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week_ts,
                   CAST(SUM(CAST(round(value * 1000000.0, 0) AS BIGINT)) AS BIGINT)
                       AS sum_micro
            FROM events GROUP BY 1, 2
        ),
        lagged AS (
            SELECT event_type, week_ts, sum_micro,
                   lag(sum_micro) OVER (PARTITION BY event_type
                       ORDER BY week_ts) AS prev
            FROM wk
        )
        SELECT event_type, week_ts, sum_micro,
               sum_micro - prev AS wow_delta_micro,
               CASE WHEN prev IS NULL THEN NULL
                    WHEN 10000 * (sum_micro - prev) >= 0
                    THEN CAST((10000 * (sum_micro - prev)) // prev AS BIGINT)
                    ELSE CAST(-((-(10000 * (sum_micro - prev)) + prev - 1) // prev)
                              AS BIGINT) END AS wow_delta_bp
        FROM lagged ORDER BY event_type, week_ts
    """,
    "t18_top_event_trigrams": """
        WITH tri AS (
            SELECT t1, t2, t3, COUNT(*) AS n FROM (
                SELECT lag(event_type, 2) OVER w AS t1,
                       lag(event_type, 1) OVER w AS t2,
                       event_type AS t3
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
            ) WHERE t1 IS NOT NULL GROUP BY 1, 2, 3
        ),
        tot AS (SELECT SUM(n) AS total FROM tri)
        SELECT t1, t2, t3, n,
               CAST((10000 * n) // total AS BIGINT) AS share_bp
        FROM tri CROSS JOIN tot
        ORDER BY n DESC, t1, t2, t3 LIMIT 20
    """,
    "t18_twap_by_type": """
        WITH r AS (
            SELECT event_type,
                   CAST(round(value * 100.0, 0) AS BIGINT) AS vc,
                   lead(epoch_us(ts)) OVER (PARTITION BY event_type
                       ORDER BY ts ASC, event_id ASC) - epoch_us(ts) AS dur_us
            FROM events
        )
        SELECT event_type, COUNT(*) AS n_intervals,
               CAST(SUM(dur_us) AS BIGINT) AS total_us,
               CAST(SUM(vc * dur_us) // SUM(dur_us) AS BIGINT) AS twap_centi
        FROM r WHERE dur_us IS NOT NULL
        GROUP BY 1 ORDER BY 1
    """,
    "ext_rolling_7d_hll_users": """
        WITH hashed AS (
            SELECT CAST(ts AS DATE) AS day,
                   ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                       % 64 AS reg,
                   ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 9, 8))::BIGINT
                       AS h2
            FROM events
        ),
        daily AS (
            SELECT day, reg,
                   MAX(CASE WHEN h2 = 0 THEN 33
                            ELSE 33 - length(bin(h2)) END) AS r
            FROM hashed GROUP BY 1, 2
        ),
        win_regs AS (
            SELECT w_day, reg, MAX(r) AS r
            FROM (SELECT CAST(unnest(generate_series(day, day + 6, INTERVAL 1 DAY))
                              AS DATE) AS w_day, reg, r
                  FROM daily)
            GROUP BY 1, 2
        ),
        per AS (
            SELECT w_day, COUNT(*) AS n_obs, SUM(power(2.0, -r)) AS s_obs
            FROM win_regs GROUP BY 1
        ),
        est AS (
            SELECT w_day,
                   CAST(floor(CASE
                       WHEN (0.709 * 64 * 64) / (s_obs + (64 - n_obs)) <= 2.5 * 64
                            AND (64 - n_obs) > 0
                       THEN 64.0 * ln(64.0 / (64 - n_obs))
                       ELSE (0.709 * 64 * 64) / (s_obs + (64 - n_obs)) END)
                       AS BIGINT) AS hll_active_7d
            FROM per
        ),
        span AS (SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi
                 FROM events),
        grid AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
                     AS day FROM span)
        SELECT g.day, COALESCE(e.hll_active_7d, 0) AS hll_active_7d
        FROM grid g LEFT JOIN est e ON g.day = e.w_day
        ORDER BY g.day
    """,
    "ext_hll_setops_click_purchase": """
        WITH hashed AS (
            SELECT event_type,
                   ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                       % 64 AS reg,
                   ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 9, 8))::BIGINT
                       AS h2
            FROM events WHERE event_type IN ('click', 'purchase')
        ),
        ranked AS (
            SELECT event_type, reg,
                   CASE WHEN h2 = 0 THEN 33 ELSE 33 - length(bin(h2)) END AS rnk
            FROM hashed
        ),
        ra AS (SELECT reg, MAX(rnk) AS r FROM ranked
               WHERE event_type = 'click' GROUP BY 1),
        rb AS (SELECT reg, MAX(rnk) AS r FROM ranked
               WHERE event_type = 'purchase' GROUP BY 1),
        ru AS (SELECT reg, MAX(r) AS r
               FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY 1),
        est AS (
            SELECT side,
                   CAST(floor(CASE
                       WHEN (0.709 * 64 * 64) / (s_obs + (64 - n_obs)) <= 2.5 * 64
                            AND (64 - n_obs) > 0
                       THEN 64.0 * ln(64.0 / (64 - n_obs))
                       ELSE (0.709 * 64 * 64) / (s_obs + (64 - n_obs)) END)
                       AS BIGINT) AS e
            FROM (
                SELECT 'a' AS side, COUNT(*) AS n_obs, SUM(power(2.0, -r)) AS s_obs FROM ra
                UNION ALL
                SELECT 'b', COUNT(*), SUM(power(2.0, -r)) FROM rb
                UNION ALL
                SELECT 'u', COUNT(*), SUM(power(2.0, -r)) FROM ru
            )
        ),
        exact AS (
            SELECT COUNT(DISTINCT CASE WHEN event_type = 'click' THEN user_id END)
                       AS exact_clickers,
                   COUNT(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END)
                       AS exact_purchasers,
                   COUNT(DISTINCT user_id) AS exact_union
            FROM events WHERE event_type IN ('click', 'purchase')
        )
        SELECT ea.e AS est_clickers, eb.e AS est_purchasers, eu.e AS est_union,
               ea.e + eb.e - eu.e AS est_intersection,
               exact_clickers, exact_purchasers, exact_union,
               exact_clickers + exact_purchasers - exact_union AS exact_intersection
        FROM (SELECT e FROM est WHERE side = 'a') ea,
             (SELECT e FROM est WHERE side = 'b') eb,
             (SELECT e FROM est WHERE side = 'u') eu,
             exact
    """,
    "ext_portable_hll_users": """
        WITH hashed AS (
            SELECT event_type,
                   ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                       % 64 AS reg,
                   ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 9, 8))::BIGINT
                       AS h2
            FROM events
        ),
        regs AS (
            SELECT event_type, reg,
                   MAX(CASE WHEN h2 = 0 THEN 33
                            ELSE 33 - length(bin(h2)) END) AS r
            FROM hashed GROUP BY 1, 2
        ),
        per AS (
            SELECT event_type, COUNT(*) AS n_obs,
                   SUM(power(2.0, -r)) AS s_obs
            FROM regs GROUP BY 1
        ),
        est AS (
            SELECT event_type,
                   CASE WHEN (0.709 * 64 * 64) / (s_obs + (64 - n_obs)) <= 2.5 * 64
                             AND (64 - n_obs) > 0
                        THEN 64.0 * ln(64.0 / (64 - n_obs))
                        ELSE (0.709 * 64 * 64) / (s_obs + (64 - n_obs)) END AS e
            FROM per
        ),
        exact AS (
            SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
            FROM events GROUP BY 1
        )
        SELECT x.event_type, x.exact_distinct,
               CAST(floor(e) AS BIGINT) AS hll_estimate
        FROM exact x JOIN est USING (event_type)
        ORDER BY event_type
    """,
    "t18_weighted_median_value": """
        WITH rows_w AS (
            SELECT event_type,
                   CAST(round(value * 1000000.0, 0) AS BIGINT) AS vmicro,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS wt
            FROM events
            WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 0
        ),
        cum AS (
            SELECT event_type, vmicro,
                   CAST(SUM(wt) OVER (PARTITION BY event_type ORDER BY vmicro ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cum_wt,
                   CAST(SUM(wt) OVER (PARTITION BY event_type) AS BIGINT) AS tot_wt
            FROM rows_w
        )
        SELECT event_type, MIN(vmicro) AS wmedian_micro,
               CAST(MAX(tot_wt) AS BIGINT) AS total_weight
        FROM cum WHERE 2 * cum_wt >= tot_wt
        GROUP BY 1 ORDER BY 1
    """,
    "t18_session_basket_pairs": """
        WITH s AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                             > 1800 * 1000000 THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ),
        numbered AS (
            SELECT user_id, event_type,
                   SUM(is_new) OVER (PARTITION BY user_id
                       ORDER BY ts ASC, event_id ASC
                       ROWS UNBOUNDED PRECEDING) + 1 AS session_seq
            FROM s
        ),
        st AS (SELECT DISTINCT user_id, session_seq, event_type FROM numbered),
        n AS (SELECT COUNT(*) AS n_sessions
              FROM (SELECT DISTINCT user_id, session_seq FROM st)),
        singles AS (SELECT event_type AS t, COUNT(*) AS n_t FROM st GROUP BY 1),
        pairs AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   COUNT(*) AS n_sessions_with_pair
            FROM st a JOIN st b
              ON a.user_id = b.user_id AND a.session_seq = b.session_seq
             AND a.event_type < b.event_type
            GROUP BY 1, 2
        )
        SELECT type_a, type_b, n_sessions_with_pair,
               CAST((10000 * n_sessions_with_pair) // n_sessions AS BIGINT)
                   AS support_bp,
               CAST((10000 * n_sessions_with_pair) // sa.n_t AS BIGINT)
                   AS confidence_bp,
               CAST((1000000 * n_sessions * n_sessions_with_pair)
                    // (sa.n_t * sb.n_t) AS BIGINT) AS lift_micro
        FROM pairs
        JOIN singles sa ON sa.t = type_a
        JOIN singles sb ON sb.t = type_b
        CROSS JOIN n
        ORDER BY type_a, type_b
    """,
    "t18_concurrent_sessions_hourly": """
        WITH s AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                             > 1800 * 1000000 THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ),
        numbered AS (
            SELECT user_id, ts,
                   SUM(is_new) OVER (PARTITION BY user_id
                       ORDER BY ts ASC, event_id ASC
                       ROWS UNBOUNDED PRECEDING) + 1 AS session_seq
            FROM s
        ),
        bounds AS (
            SELECT user_id, session_seq,
                   MIN(ts) AS s_start, MAX(ts) AS s_end
            FROM numbered GROUP BY 1, 2
        ),
        hours AS (
            SELECT unnest(generate_series(date_trunc('hour', s_start),
                                          date_trunc('hour', s_end),
                                          INTERVAL 1 HOUR)) AS hr
            FROM bounds
        )
        SELECT CAST(hr AS TIMESTAMP) AS hr, COUNT(*) AS n_active_sessions
        FROM hours GROUP BY 1 ORDER BY 1
    """,
    "t18_event_lateness_profile": """
        WITH h AS (
            SELECT event_type,
                   MAX(epoch_us(ts)) OVER (ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - epoch_us(ts) AS lateness_us
            FROM events
        )
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CASE WHEN lateness_us > 1800000000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_late_30m,
               CAST(MAX(lateness_us) AS BIGINT) AS max_lateness_us
        FROM h GROUP BY 1 ORDER BY 1
    """,
    "ext_table_checksums": """
        WITH d AS (
            SELECT ('0x' || substring(md5(concat_ws('|',
                       COALESCE(CAST(doc_id AS VARCHAR), chr(0) || 'NULL'),
                       COALESCE(text, chr(0) || 'NULL'),
                       COALESCE(lang, chr(0) || 'NULL'),
                       COALESCE(source, chr(0) || 'NULL'),
                       COALESCE(CAST(n_chars AS VARCHAR), chr(0) || 'NULL')
                   )), 1, 15))::BIGINT AS h
            FROM documents
        ),
        e AS (
            SELECT ('0x' || substring(md5(concat_ws('|',
                       COALESCE(CAST(event_id AS VARCHAR), chr(0) || 'NULL'),
                       COALESCE(CAST(epoch_us(ts) AS VARCHAR), chr(0) || 'NULL'),
                       COALESCE(CAST(user_id AS VARCHAR), chr(0) || 'NULL'),
                       COALESCE(event_type, chr(0) || 'NULL'),
                       COALESCE(CAST(CAST(round(value * 1000000.0, 0) AS BIGINT)
                                     AS VARCHAR), chr(0) || 'NULL')
                   )), 1, 15))::BIGINT AS h
            FROM events
        )
        SELECT 'documents' AS table_name, COUNT(*) AS n_rows,
               CAST(bit_xor(h) AS BIGINT) AS xor_digest FROM d
        UNION ALL
        SELECT 'events', COUNT(*), CAST(bit_xor(h) AS BIGINT) FROM e
        ORDER BY table_name
    """,
    "ext_bpe_merge_table": _bpe_sql(_BPE_VOCAB_SQL, rounds=BPE_ROUNDS),
    "ext_bpe_encode_summary": _bpe_apply_sql(_BPE_VOCAB_SQL, rounds=BPE_ROUNDS),
    "t18_ols_value_on_prop": """
        WITH m AS (
            SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx
            FROM (
                SELECT event_type,
                       CAST(json_extract_string(props, '$.k') AS BIGINT) AS x,
                       CAST(round(value * 100.0, 0) AS BIGINT) AS y
                FROM events
            ) GROUP BY 1
        )
        SELECT event_type, n,
               CAST(CASE WHEN 100 * (n * sxy - sx * sy) >= 0
                    THEN (100 * (n * sxy - sx * sy)) // (n * sxx - sx * sx)
                    ELSE -((-(100 * (n * sxy - sx * sy)) + (n * sxx - sx * sx) - 1)
                           // (n * sxx - sx * sx)) END AS BIGINT)
                   AS slope_centi_floor,
               ROUND((CAST(sy AS DOUBLE)
                      - CAST(n * sxy - sx * sy AS DOUBLE)
                        / CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(sx AS DOUBLE))
                     / CAST(n AS DOUBLE), 4) AS intercept_centi
        FROM m ORDER BY event_type
    """,
    "t18_event_debounce_summary": """
        WITH g AS (
            SELECT event_type,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts ASC, event_id ASC) AS gap_us
            FROM events
        ),
        f AS (SELECT event_type, gap_us,
                     (gap_us IS NULL OR gap_us > 300000000) AS kept
              FROM g)
        SELECT event_type, COUNT(*) AS n_events,
               CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               MIN(gap_us) FILTER (NOT kept) AS min_dropped_gap_us,
               MAX(gap_us) FILTER (NOT kept) AS max_dropped_gap_us
        FROM f GROUP BY 1 ORDER BY 1
    """,
    "ext_embedding_dim_variance": """
        WITH flat AS (
            -- cast to DOUBLE before scaling: DuckDB keeps FLOAT*literal in
            -- FLOAT precision (215395.4953 -> float 215395.5 -> rounds up),
            -- Spark promotes to DOUBLE
            SELECT generate_subscripts(embedding, 1) AS dim,
                   CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000.0, 0)
                        AS BIGINT) AS x
            FROM embeddings
        ),
        m AS (
            SELECT dim, COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx
            FROM flat GROUP BY 1
        )
        SELECT CAST(dim AS BIGINT) AS dim, n,
               CAST(CASE WHEN sx >= 0 THEN sx // n
                    ELSE -((-sx + n - 1) // n) END AS BIGINT) AS mean_micro_floor,
               CAST((n * sxx - sx * sx) // (n * (n - 1)) AS BIGINT) AS var_micro2_floor
        FROM m ORDER BY dim
    """,
    "ext_weighted_sample": """
        WITH scored AS (
            SELECT doc_id, n_chars AS weight,
                   ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       + 0.5) / 4294967296.0) / n_chars AS score
            FROM documents
        )
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank,
               doc_id, weight
        FROM scored ORDER BY score DESC, doc_id ASC LIMIT 20
    """,
    "t18_corr_value_prop": """
        WITH m AS (
            SELECT event_type, COUNT(*) AS n,
                   SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
                   SUM(x * x) AS sxx, SUM(y * y) AS syy
            FROM (
                SELECT event_type,
                       CAST(round(value * 100.0, 0) AS BIGINT) AS x,
                       CAST(json_extract_string(props, '$.k') AS BIGINT) AS y
                FROM events
            ) GROUP BY 1
        )
        SELECT event_type, n,
               ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                     / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                            * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
                     6) AS pearson_r
        FROM m ORDER BY event_type
    """,
    "ext_chi2_lang_source": """
        WITH cells AS (SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY 1, 2),
        rt AS (SELECT lang, SUM(o) AS row_tot FROM cells GROUP BY 1),
        ct AS (SELECT source, SUM(o) AS col_tot FROM cells GROUP BY 1),
        n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT CAST(ANY_VALUE(n_docs) AS BIGINT) AS n_docs,
               CAST(((SELECT COUNT(*) FROM rt) - 1) * ((SELECT COUNT(*) FROM ct) - 1)
                    AS BIGINT) AS dof,
               CAST(SUM(CAST(floor((o - row_tot * col_tot / CAST(n_docs AS DOUBLE))
                              * (o - row_tot * col_tot / CAST(n_docs AS DOUBLE))
                              / (row_tot * col_tot / CAST(n_docs AS DOUBLE))
                              * 1000000.0) AS BIGINT)) AS BIGINT) AS chi2_micro
        FROM cells JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN n
    """,
    "ext_source_bigram_jaccard": """
        WITH toks AS (
            SELECT source, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
            FROM documents
        ),
        bigrams AS (
            SELECT DISTINCT source, t[i] || ' ' || t[i + 1] AS bg
            FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)
        ),
        sizes AS (SELECT source, COUNT(*) AS sz FROM bigrams GROUP BY 1),
        inter AS (
            SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS inter
            FROM bigrams a JOIN bigrams b
              ON a.bg = b.bg AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT src_a, src_b, inter,
               sa.sz + sb.sz - inter AS uni,
               (10000 * inter) // (sa.sz + sb.sz - inter) AS jaccard_bp
        FROM inter
        JOIN sizes sa ON sa.source = src_a
        JOIN sizes sb ON sb.source = src_b
        ORDER BY src_a, src_b
    """,
    "t18_trailing_hour_value": """
        SELECT user_id, event_id,
               CAST(SUM(CAST(round(value * 1000000.0, 0) AS BIGINT)) OVER w AS BIGINT) AS trailing_hr_micro,
               COUNT(*) OVER w AS n_trailing
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, event_id
    """,
    "t18_value_decile_bands": """
        WITH ranked AS (
            SELECT event_type,
                   CAST(round(value * 1000000.0, 0) AS BIGINT) AS vmicro,
                   NTILE(10) OVER w AS decile,
                   RANK() OVER w AS rnk,
                   COUNT(*) OVER (PARTITION BY event_type) AS cnt
            FROM events
            WINDOW w AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC)
        )
        SELECT event_type, CAST(decile AS INT) AS decile, COUNT(*) AS n,
               CAST(SUM(vmicro) AS BIGINT) AS sum_micro,
               MIN((10000 * (rnk - 1)) // (cnt - 1)) AS lo_bp,
               MAX((10000 * (rnk - 1)) // (cnt - 1)) AS hi_bp
        FROM ranked GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "t18_rolling_7d_active_users": """
        WITH acts AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        span AS (SELECT min(day) AS lo, max(day) AS hi FROM acts),
        grid AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM span),
        contrib AS (
            SELECT w_day, COUNT(*) AS n FROM (
                SELECT DISTINCT unnest(generate_series(day, day + 6, INTERVAL 1 DAY)) AS w_day,
                       user_id
                FROM acts
            ) GROUP BY 1
        )
        SELECT CAST(g.day AS DATE) AS day, COALESCE(c.n, 0) AS active_users_7d
        FROM grid g LEFT JOIN contrib c ON CAST(g.day AS DATE) = CAST(c.w_day AS DATE)
        ORDER BY day
    """,
    "t18_iqr_outlier_summary": """
        WITH stats AS (
            SELECT event_type,
                   quantile_cont(value, 0.25) AS p25,
                   quantile_cont(value, 0.75) AS p75
            FROM events GROUP BY 1
        ),
        fenced AS (
            SELECT e.event_type, e.value, s.p25, s.p75,
                   (e.value < s.p25 - 1.5 * (s.p75 - s.p25)
                    OR e.value > s.p75 + 1.5 * (s.p75 - s.p25)) AS is_out
            FROM events e JOIN stats s USING (event_type)
        )
        SELECT event_type, ROUND(ANY_VALUE(p25), 4) AS p25,
               ROUND(ANY_VALUE(p75), 4) AS p75,
               COUNT(*) AS n,
               CAST(SUM(CASE WHEN is_out THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               ROUND(MIN(value) FILTER (is_out), 4) AS min_outlier,
               ROUND(MAX(value) FILTER (is_out), 4) AS max_outlier
        FROM fenced GROUP BY 1 ORDER BY 1
    """,
    "ext_chunk_dup_spans": """
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
            FROM documents
        ),
        chunks AS (
            SELECT doc_id, i AS chunk_no,
                   md5(array_to_string(t[(i*10+1):(i*10+10)], ' ')) AS h
            FROM toks,
                 unnest(generate_series(0, CAST(len(t) // 10 AS INT) - 1)) AS g(i)
        ),
        dups AS (
            SELECT h FROM chunks GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
        )
        SELECT c.doc_id, COUNT(*) AS n_chunks,
               CAST(SUM(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
               CAST((10000 * SUM(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT) AS dup_bp,
               CAST((COUNT(*) - SUM(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END)) * 10
                   AS BIGINT) AS surviving_tokens
        FROM chunks c LEFT JOIN dups d USING (h)
        GROUP BY 1 ORDER BY 1
    """,
    "ext_stratified_sample": """
        SELECT lang, source, doc_id, CAST(rnk AS INT) AS rnk FROM (
            SELECT lang, source, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY lang, source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rnk
            FROM documents
        ) WHERE rnk <= 5
        ORDER BY lang, source, rnk
    """,
    "ext_unpivot_hourly": """
        WITH agg AS (
            SELECT CAST(hour(ts) AS BIGINT) AS hour_of_day, event_type,
                   ROUND(SUM(value), 2) AS s
            FROM events GROUP BY 1, 2
        ),
        grid AS (
            SELECT DISTINCT a.hour_of_day, t.event_type
            FROM agg a CROSS JOIN (
                SELECT unnest(['click','error','purchase','signup','view']) AS event_type
            ) t
        )
        SELECT g.hour_of_day, g.event_type, COALESCE(a.s, 0.0) AS sum_value
        FROM grid g LEFT JOIN agg a USING (hour_of_day, event_type)
        ORDER BY 1, 2
    """,
    "ext_token_pmi_pairs": """
        WITH toks AS (
            SELECT doc_id,
                   list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
            FROM documents
        ),
        dfc AS (
            SELECT token, COUNT(*) AS df
            FROM (SELECT doc_id, unnest(t) AS token FROM toks)
            GROUP BY 1
        ),
        top AS (SELECT token FROM dfc ORDER BY df DESC, token ASC LIMIT 50),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        kept AS (
            SELECT doc_id, token
            FROM (SELECT doc_id, unnest(t) AS token FROM toks)
            JOIN top USING (token)
        ),
        pairs AS (
            SELECT k1.token AS tok_a, k2.token AS tok_b, COUNT(*) AS c_xy
            FROM kept k1 JOIN kept k2
              ON k1.doc_id = k2.doc_id AND k1.token < k2.token
            GROUP BY 1, 2
        )
        SELECT tok_a, tok_b, c_xy,
               CAST(floor(ln(n_docs * c_xy / (dx.df * dy.df)) * 1000000.0) AS BIGINT)
                   AS pmi_micro
        FROM pairs
        JOIN dfc dx ON dx.token = tok_a
        JOIN dfc dy ON dy.token = tok_b
        CROSS JOIN n
        ORDER BY tok_a, tok_b
    """,
}
