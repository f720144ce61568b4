"""Similarity search over embedding columns (array<float>).

Two paths:
- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot products are JVM-side (zip_with + aggregate), no UDF; the k-selection
  is a per-query window top-k, which Spark executes as a partial top-k per
  partition (WindowGroupLimit) — no global sort.
- ``lsh_topk``: random-hyperplane LSH: sign-bit signature → bucket join →
  exact re-rank within buckets. Sub-quadratic candidate generation is the
  100 TB path; brute force is O(|queries| × |corpus|).

- ``ivf_topk``: inverted-file (IVF) index: a k-means coarse quantizer
  (distributed pyspark.ml KMeans, seeded) assigns every corpus vector to
  its nearest centroid cell; queries probe their ``nprobe`` nearest cells
  and re-rank exactly inside them. At 100 TB the corpus is written
  partitioned by ``cell`` so a probe is a partition-pruned scan, and the
  centroid table (n_cells × dim floats) rides along as literals —
  no shuffle of the corpus per query batch.

Public sources: hyperplane LSH — Charikar (STOC 2002); IVF/nprobe —
Jégou/Douze/Schmid, "Product Quantization for Nearest Neighbor Search"
(TPAMI 2011, the IVF coarse-quantizer stage, without PQ codes);
scalable k-means init — Bahmani et al., "Scalable k-means++" (VLDB
2012, via pyspark.ml's k-means|| implementation).
"""

from __future__ import annotations

import math
import random

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns, JVM-side."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, x: s + x * x))
    return dot / (na * nb)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Excludes self-matches (same id). Deterministic: ties broken by
    neighbor id after rounding to 6 decimals."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic unit-normal hyperplanes (public LSH construction)."""
    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        norm = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / norm for x in v])
    return planes


def _bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature of ``vec`` against the hyperplanes, as one int."""
    out = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        dot = F.aggregate(
            F.zip_with(vec, plane, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
        )
        out = out + F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: ``n_tables`` hyperplane bucketings, exact cosine
    re-rank within candidate buckets.

    All tables' bucket ids are computed in ONE projection and posexploded
    with their table index — a per-table union would scan (and re-hash)
    the corpus n_tables times; this shape scans once and shuffles
    (id, vec, table, bucket) keyed by (table, bucket). At scale the
    corpus side is written bucketed-by(table, bucket) so each query
    probes co-located buckets instead of the full corpus.
    """
    from pyspark.sql import Window

    all_planes = [
        random_hyperplanes(dim, n_planes, seed=42 + 1000 * t) for t in range(n_tables)
    ]

    def tabled(df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
        src = df.select(
            F.col(id_col).alias(id_alias), _as_double(F.col(vec_col)).alias(vec_alias)
        )
        buckets = F.array(*[_bucket(F.col(vec_alias), p) for p in all_planes])
        # posexplode_outer: a plain explode infers size()>0 and pushes the
        # whole hyperplane-dot tree into the scan filter (see dedup.py)
        return src.select(
            id_alias, vec_alias, F.posexplode_outer(buckets).alias("table", "bucket")
        )

    ct = tabled(corpus, "neighbor_id", "cv")
    qt = tabled(queries, "query_id", "qv")
    cand = (
        qt.join(ct, ["table", "bucket"])
        .select("query_id", "qv", "neighbor_id", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def blocked_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_blocks: int = 8,
) -> DataFrame:
    """All-pairs cosine ≥ threshold via triangle block partitioning and
    per-block-pair numpy matmul inside applyInPandas.

    Rows are hashed into ``n_blocks`` blocks; each unordered block pair
    (i ≤ j) becomes one task, and a row is shipped to every task its block
    belongs to (replication factor = n_blocks, the standard triangle join).
    Inside a task the cosine matrix is one Arrow-batched BLAS matmul —
    vectorized Python is the right tool here because the per-pair dot
    product is exactly the interpreted-per-element worst case for JVM
    higher-order functions. Each output pair (min_id, max_id) falls in
    exactly one task, so no dedup pass is needed. At 100 TB pick
    n_blocks ≈ sqrt(cluster cores) so each task's matrices fit in executor
    memory while replication stays O(sqrt(P))."""
    import pandas as pd

    tasks = []
    t = 0
    for i in range(n_blocks):
        for j in range(i, n_blocks):
            tasks.append((t, i, 0))
            if j != i:
                tasks.append((t, j, 1))
            t += 1
    spark = df.sparkSession
    tasks_df = spark.createDataFrame(tasks, "task_id int, blk int, side int")
    rows = df.select(
        F.col(id_col).alias("vid"),
        _as_double(F.col(vec_col)).alias("v"),
        F.pmod(F.col(id_col), F.lit(n_blocks)).cast("int").alias("blk"),
    )
    member = rows.join(F.broadcast(tasks_df), "blk").select("task_id", "side", "vid", "v")

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        sides = pdf["side"].to_numpy()
        ids = pdf["vid"].to_numpy()
        vecs = np.stack(pdf["v"].to_numpy())
        vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        diagonal = not (sides == 1).any()
        if diagonal:
            ia = ib = np.arange(len(ids))
        else:
            ia, ib = np.where(sides == 0)[0], np.where(sides == 1)[0]
        cos = vecs[ia] @ vecs[ib].T
        np.round(cos, 6, out=cos)
        if diagonal:
            np.fill_diagonal(cos, -1.0)  # no self-pairs
        r, c = np.where(cos >= threshold)
        a_ids, b_ids = ids[ia[r]], ids[ib[c]]
        lo, hi = np.minimum(a_ids, b_ids), np.maximum(a_ids, b_ids)
        keep = lo < hi  # drops diagonal dupes (r<c and r>c both present)
        # diagonal tasks emit each pair twice (i,j) and (j,i) — keep one
        if diagonal:
            keep &= a_ids < b_ids
        return pd.DataFrame(
            {"vec_a": lo[keep], "vec_b": hi[keep], "cos_sim": cos[r, c][keep]}
        )

    return member.groupBy("task_id").applyInPandas(
        compute, "vec_a long, vec_b long, cos_sim double"
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_cells: int = 16,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    max_iter: int = 20,
) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with k-means, then
    inside each cluster mark every vector that has a SMALLER-id neighbor
    with cosine >= ``threshold`` as a duplicate — cross-cluster pairs are
    never compared, which is the approximation that makes web-scale
    dedup tractable. Returns ``(id_col, cell, max_prior_sim, is_dup)``
    for every input vector.

    Plan shape: one JVM-expression pass assigns each vector to its
    nearest centroid (no shuffle — centroids ride as literals), then ONE
    shuffle groups by cell and each cluster's pairwise-cosine matrix is
    a single Arrow-batched numpy matmul (the per-pair dot product is the
    interpreted-per-element worst case for JVM higher-order functions).
    At 100 TB: n_cells grows with the corpus (the paper uses ~10^5
    clusters) so expected cluster size stays bounded; a skew-degenerate
    giant cluster should be sub-blocked with the triangle join of
    ``blocked_neardup_pairs`` scoped to that cell.

    Drop policy: keep the minimum id of every duplicate pair —
    deterministic, engine-independent, and idempotent (re-running on the
    survivors drops nothing: a kept vector has no kept smaller-id
    neighbor above threshold by construction).
    """
    import pandas as pd

    if centroids is None:
        centroids = kmeans_centroids(df, vec_col, n_cells, seed, max_iter)
    rows = df.select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v")
    )
    rows = rows.select(
        "vid",
        "v",
        F.element_at(nearest_cells(F.col("v"), centroids, 1), 1).alias("cell"),
    )

    def dedup_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("vid").reset_index(drop=True)
        ids = pdf["vid"].to_numpy()
        vecs = np.stack(pdf["v"].to_numpy())
        vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        cos = vecs @ vecs.T
        np.round(cos, 6, out=cos)
        # max similarity to any SMALLER-id vector (strict lower triangle)
        tril = np.tril(cos, k=-1)
        tril[np.triu_indices(len(ids))] = -1.0
        max_prior = tril.max(axis=1, initial=-1.0)
        return pd.DataFrame(
            {
                "vid": ids,
                "cell": pdf["cell"],
                "max_prior_sim": max_prior,
                "is_dup": max_prior >= threshold,
            }
        )

    return (
        rows.groupBy("cell")
        .applyInPandas(
            dedup_cell, "vid long, cell int, max_prior_sim double, is_dup boolean"
        )
        .withColumnRenamed("vid", id_col)
    )


def kmeans_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 42,
    max_iter: int = 20,
) -> list[list[float]]:
    """Train IVF coarse-quantizer centroids with distributed k-means.

    Uses pyspark.ml (k-means|| init, seeded) so training itself scales out;
    only the tiny centroid matrix (n_cells × dim) comes back to the driver.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.select(
        array_to_vector(_as_double(F.col(vec_col))).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(feats)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def nearest_cells(vec: Column, centroids: list[list[float]], nprobe: int) -> Column:
    """array<int> of the ``nprobe`` nearest centroid ids for ``vec``.

    Pure JVM expression: per-centroid squared L2 via zip_with/aggregate,
    array_sort on (distance, cell) structs, slice. Ties break on cell id."""
    cells = []
    for i, cvec in enumerate(centroids):
        lit = F.array(*[F.lit(x) for x in cvec])
        d2 = F.aggregate(
            F.zip_with(vec, lit, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        cells.append(F.struct(d2.alias("d"), F.lit(i).alias("cell")))
    nearest = F.slice(F.array_sort(F.array(*cells)), 1, nprobe)
    return F.transform(nearest, lambda s: s["cell"])


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    max_iter: int = 20,
) -> DataFrame:
    """Approximate top-k via an IVF index: k-means cells + nprobe probing.

    Pass precomputed ``centroids`` to reuse a trained quantizer (at scale
    the corpus-side cell assignment is computed once at write time and the
    corpus stored partitioned by cell; probing is then partition pruning)."""
    from pyspark.sql import Window

    if centroids is None:
        centroids = kmeans_centroids(corpus, vec_col, n_cells, seed, max_iter)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    c = c.select(
        "neighbor_id", "cv",
        F.element_at(nearest_cells(F.col("cv"), centroids, 1), 1).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    q = q.select(
        "query_id", "qv",
        # outer: a plain explode infers size()>0 and pushes the whole
        # centroid-distance tree into the scan filter (re-evaluated per row)
        F.explode_outer(nearest_cells(F.col("qv"), centroids, nprobe)).alias("cell"),
    )
    # Each corpus vector lives in exactly one cell and a query's probed
    # cells are distinct, so (query_id, neighbor_id) pairs are unique —
    # no dropDuplicates needed (unlike multi-table LSH).
    cand = (
        q.join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
