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

# Target rows per triangle-join block (blocked_neardup_pairs): per-task
# cosine matrices stay ~BLOCK_TARGET² doubles (~50 MB) no matter how big
# the corpus grows — the same corpus-scaled discipline as SemDeDup's
# cells. Measured at m=30 (60k vectors): fixed 8 blocks = 54 s, scaled
# 24 blocks = 7.6 s, identical pair output.
BLOCK_TARGET = 2500


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
    """Sign-bit signature of ``vec`` against the hyperplanes, as one int.

    The plane matrix is ONE nested-array literal iterated with an
    index-lambda transform, not per-plane expression subtrees: the old
    unrolled form put n_planes × dim literal nodes in the tree, and
    Catalyst analysis/optimization of those walls dominated several ANN
    queries' wall-clock (plans/r07/ext_pq_ann_topk_before.txt is 68 KB
    of literals). Same dot products, same fold order, same bit sum —
    bit-identical buckets."""
    planes_lit = F.lit([[float(x) for x in p] for p in planes])
    bits = F.transform(
        planes_lit,
        lambda p, i: F.when(
            F.aggregate(
                F.zip_with(vec, p, lambda x, y: x * y),
                F.lit(0.0),
                lambda s, x: s + x,
            )
            >= 0,
            # F.shiftleft only takes a Python-int shift; the SQL
            # function accepts column expressions (dedup.py idiom)
            F.call_function("shiftleft", F.lit(1), i),
        ).otherwise(F.lit(0)),
    )
    return F.aggregate(bits, F.lit(0), lambda a, x: a + x)


def lsh_table_buckets(
    df: DataFrame,
    all_planes: list[list[list[float]]],
    id_col: str,
    vec_col: str,
    id_alias: str,
    vec_alias: str,
) -> DataFrame:
    """(id_alias, vec_alias, table, bucket) — every LSH table's sign-bit
    bucket for every vector, computed in ONE numpy matmul per Arrow
    batch (the production bucketing shared by lsh_topk's corpus AND
    query sides). tests/test_ann_twin_parity.py proves this numpy path
    bit-identical to the declarative ``_bucket`` expression form (the
    shape the oracle-checked ann_fixed twins run), tying the trained
    production path to the cross-engine-verified mechanics."""
    import pandas as pd

    n_tables = len(all_planes)
    n_planes = len(all_planes[0])
    src = df.select(
        F.col(id_col).alias(id_alias), _as_double(F.col(vec_col)).alias(vec_alias)
    )
    plane_mat = [p for tbl in all_planes for p in tbl]  # (T*B, dim)

    def sig(batches):
        import numpy as np

        pm = np.array(plane_mat)  # (T*B, dim)
        weights = 1 << np.arange(n_planes)
        for pdf in batches:
            if not len(pdf):  # mapInPandas can deliver empty Arrow batches
                continue
            x = np.stack(pdf[vec_alias].to_numpy())
            bits = (x @ pm.T >= 0).astype("int64")
            buckets = (
                bits.reshape(len(x), n_tables, n_planes) * weights
            ).sum(axis=2).astype("int32")
            yield pd.DataFrame(
                {
                    id_alias: pdf[id_alias],
                    vec_alias: pdf[vec_alias],
                    "buckets": list(buckets),
                }
            )

    # Derive the id field's type from the input — hardcoding 'long'
    # breaks (Arrow schema error or silent cast) for int/string ids.
    id_type = src.schema[id_alias].dataType.simpleString()
    signed = src.mapInPandas(
        sig,
        f"{id_alias} {id_type}, {vec_alias} array<double>, "
        "buckets array<int>",
    )
    return signed.select(
        id_alias, vec_alias, F.posexplode_outer("buckets").alias("table", "bucket")
    )


def lsh_query_probe_buckets(
    df: DataFrame,
    all_planes: list[list[list[float]]],
    id_col: str,
    vec_col: str,
    id_alias: str,
    vec_alias: str,
    p_flips: int = 2,
) -> DataFrame:
    """(id_alias, vec_alias, table, bucket) — the MULTI-PROBE query-side
    bucketing (Lv et al., VLDB 2007): per table, the base sign bucket
    PLUS the ``p_flips`` buckets reached by flipping the
    lowest-|projection| (lowest-margin) bits, plane-index tiebreak.
    Same one-matmul-per-Arrow-batch shape as ``lsh_table_buckets`` (the
    margins fall out of the projections already computed for the sign
    bits); the corpus side stays single-bucket — multi-probe multiplies
    only the query side, which is the technique's cost model. The
    oracle-checked integer twin of this construction is
    queries/analytics56.py (T74)."""
    import pandas as pd

    n_tables = len(all_planes)
    n_planes = len(all_planes[0])
    # At most n_planes bits exist to flip; a larger request would shrink
    # the probes array below the assumed width and silently misassign
    # 'pos DIV per_table' table indices downstream.
    p_flips = min(p_flips, n_planes)
    per_table = 1 + p_flips
    src = df.select(
        F.col(id_col).alias(id_alias), _as_double(F.col(vec_col)).alias(vec_alias)
    )
    plane_mat = [p for tbl in all_planes for p in tbl]

    def sig(batches):
        import numpy as np

        pm = np.array(plane_mat)  # (T*B, dim)
        weights = 1 << np.arange(n_planes)
        for pdf in batches:
            if not len(pdf):  # mapInPandas can deliver empty Arrow batches
                continue
            x = np.stack(pdf[vec_alias].to_numpy())
            proj = x @ pm.T  # (n, T*B)
            bits = (proj >= 0).astype("int64").reshape(len(x), n_tables, n_planes)
            base = (bits * weights).sum(axis=2).astype("int32")  # (n, T)
            margins = np.abs(proj).reshape(len(x), n_tables, n_planes)
            # stable argsort = plane-index tiebreak on equal margins
            flip_j = np.argsort(margins, axis=2, kind="stable")[:, :, :p_flips]
            flips = base[:, :, None] ^ (1 << flip_j).astype("int32")  # (n, T, P)
            probes = np.concatenate([base[:, :, None], flips], axis=2)
            yield pd.DataFrame(
                {
                    id_alias: pdf[id_alias],
                    vec_alias: pdf[vec_alias],
                    "buckets": list(probes.reshape(len(x), -1)),
                }
            )

    id_type = src.schema[id_alias].dataType.simpleString()
    signed = src.mapInPandas(
        sig,
        f"{id_alias} {id_type}, {vec_alias} array<double>, "
        "buckets array<int>",
    )
    return signed.select(
        id_alias,
        vec_alias,
        F.posexplode_outer("buckets").alias("pos", "bucket"),
    ).select(
        id_alias,
        vec_alias,
        F.expr(f"pos DIV {per_table}").cast("int").alias("table"),
        "bucket",
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    multi_probe: int = 0,
) -> DataFrame:
    """Approximate top-k: ``n_tables`` hyperplane bucketings, exact cosine
    re-rank within candidate buckets. ``multi_probe`` > 0 additionally
    probes that many lowest-margin bit-flip buckets per (query, table)
    — the recall/cost knob (Lv et al. 2007); the corpus side is
    unchanged.

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

    # All tables' signatures in ONE numpy matmul per Arrow batch — the
    # JVM-expression form (_bucket) interprets n_tables×n_planes 64-dim
    # dots per row (~4M element ops on 2k vectors, the measured hot
    # spot); dense-vector policy says numpy. The per-table explode stays
    # JVM-side on the returned array (see lsh_table_buckets).
    ct = lsh_table_buckets(corpus, all_planes, id_col, vec_col, "neighbor_id", "cv")
    if multi_probe > 0:
        qt = lsh_query_probe_buckets(
            queries, all_planes, id_col, vec_col, "query_id", "qv", multi_probe
        )
    else:
        qt = lsh_table_buckets(queries, all_planes, id_col, vec_col, "query_id", "qv")
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
    n_blocks: int | None = None,
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
    exactly one task, so no dedup pass is needed.

    ``n_blocks`` defaults to corpus-scaled (ceil(n / BLOCK_TARGET), the
    SemDeDup-cells discipline): an exact all-pairs operator is O(n²·d)
    FLOPs no matter what, but a FIXED block count makes the per-task
    cosine matrix itself grow quadratically — the m=30 rehearsal
    measured 8 blocks at 60k vectors taking 54 s (450 MB matrices,
    under-parallelized) vs 7.6 s at 24 blocks. Replication is
    O(n_blocks) rows, proportionally negligible next to the pair FLOPs;
    on a cluster, BLOCK_TARGET caps each task's memory at
    ~(target² · 8) bytes regardless of corpus size."""
    import pandas as pd

    if n_blocks is None:
        # one scalar to the driver — bounded metadata, not row data
        n_blocks = max(8, -(-df.count() // BLOCK_TARGET))
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


def cell_blocked_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    probe: int = 2,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Sub-quadratic near-dup cosine pairs via SemDeDup cell blocking
    (Abbas et al. 2023, arXiv:2303.09540): k-means the embedding space
    into corpus-scaled cells (k = ceil(n / BLOCK_TARGET)), assign every
    vector to its ``probe`` nearest cells, and compare pairs ONLY inside
    shared cells.

    Semantics vs the exact ``blocked_neardup_pairs`` twin:
    - PRECISION 1.0 by construction — a candidate pair's cosine is the
      same exact normalized dot the exact path computes, so every
      emitted (pair, cos) row also appears in the exact output.
    - RECALL < 1.0: a qualifying pair whose two vectors share none of
      their ``probe`` nearest cells is missed. probe=2 multi-assignment
      recovers the classic cell-boundary misses; the residual recall is
      pinned by tests/test_similarity_twins.py on fixture corpora.

    Cost: within-cell FLOPs ≈ n · BLOCK_TARGET · probe² · d — LINEAR in
    n because expected cell size stays ~BLOCK_TARGET as k scales with
    the corpus (vs the exact triangle join's O(n²·d), which no blocking
    can reduce). The assignment matmul is n·k·d = n²·d/BLOCK_TARGET;
    it stays subdominant to the within-cell term below ~25M vectors
    (n < BLOCK_TARGET²·probe²), past which a coarse quantizer over the
    centroids (the in-repo IVF pattern) drops it to n·sqrt(k)·d.
    Replication is ``probe`` rows per vector; one shuffle groups by
    cell; each cell's cosine matrix is one Arrow-batched BLAS matmul,
    chunked so a skew-degenerate giant cell stays memory-bounded.
    """
    import pandas as pd

    if centroids is None:
        n = df.count()  # one scalar to the driver — bounded metadata
        k = max(4, -(-n // BLOCK_TARGET))
        centroids = kmeans_centroids(df, vec_col, k, seed, max_iter=10)
    probe = min(probe, len(centroids))
    rows = df.select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v")
    )

    def assign(batches):
        import numpy as np

        cm = np.array(centroids)
        cn = (cm * cm).sum(axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["v"].to_numpy())
            x2 = (x * x).sum(axis=1)
            d2 = x2[:, None] - 2.0 * (x @ cm.T) + cn[None, :]
            # stable argsort breaks distance ties on the lower cell id —
            # deterministic regardless of Arrow batching (row-wise op).
            near = np.argsort(d2, axis=1, kind="stable")[:, :probe]
            yield pd.DataFrame(
                {
                    "vid": pdf["vid"].to_numpy().repeat(probe),
                    "v": pdf["v"].to_numpy().repeat(probe),
                    "cell": near.reshape(-1).astype("int32"),
                }
            )

    member = rows.mapInPandas(assign, "vid long, v array<double>, cell int")

    def pairs_in_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.drop_duplicates("vid").sort_values("vid")
        ids = pdf["vid"].to_numpy()
        vecs = np.stack(pdf["v"].to_numpy())
        vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        out_a, out_b, out_c = [], [], []
        # chunk rows so a skew-degenerate cell's matrix stays bounded
        step = max(1, BLOCK_TARGET)
        for lo in range(0, len(ids), step):
            chunk = slice(lo, lo + step)
            cos = vecs[chunk] @ vecs[lo:].T
            np.round(cos, 6, out=cos)
            r, c = np.where(cos >= threshold)
            keep = r < c  # strict upper triangle in global (sorted) order
            out_a.append(ids[chunk][r[keep]])
            out_b.append(ids[lo:][c[keep]])
            out_c.append(cos[r[keep], c[keep]])
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(out_a) if out_a else [],
                "vec_b": np.concatenate(out_b) if out_b else [],
                "cos_sim": np.concatenate(out_c) if out_c else [],
            }
        )

    return (
        member.groupBy("cell")
        .applyInPandas(pairs_in_cell, "vec_a long, vec_b long, cos_sim double")
        .dropDuplicates(["vec_a", "vec_b"])
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

    # Cell assignment as ONE numpy matmul per Arrow batch. The literal-
    # expression form (nearest_cells) is O(n * n_cells * dim)
    # INTERPRETED lambda evaluations with an n_cells x dim literal tree
    # — fine for 8 IVF cells, quadratic-feeling once n_cells scales
    # with the corpus as SemDeDup requires (m=30 rehearsal measured the
    # assignment dominating at 120 cells). argmin ties resolve to the
    # lowest cell id, matching nearest_cells' (distance, cell) sort.
    def assign(batches):
        import numpy as np

        cm = np.array(centroids)
        cn = (cm * cm).sum(axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["v"].to_numpy())
            # Fast path: expanded x²-2xy+y² via one BLAS matmul. The
            # expansion cancels catastrophically on NEAR-TIES and could
            # flip argmin vs the documented exact nearest_cells
            # semantics — so rows whose top-2 distance gap falls inside
            # the expansion's error bound are recomputed with the exact
            # Σ(x-y)² form. Ties are rare, so the exact pass touches a
            # handful of rows and the batch stays at matmul speed
            # (the all-rows exact form measured +2 s on semdedup_summary
            # at m=30; this hybrid restores the matmul cost with the
            # same guaranteed argmin).
            x2 = (x * x).sum(axis=1)
            d2 = x2[:, None] - 2.0 * (x @ cm.T) + cn[None, :]
            cell = d2.argmin(axis=1).astype("int32")
            if d2.shape[1] > 1:
                part = np.partition(d2, 1, axis=1)
                # |expanded - exact| <= c*eps*(|x|^2 + |y|^2 + 2|x.y|)
                # where the x² summation and the BLAS dot each carry up
                # to ~d·eps·M rounding — so scale the bound by d, not a
                # fixed 64, to cover the per-dimension accumulation.
                d = cm.shape[1]
                bound = (
                    4 * d * np.finfo("f8").eps
                    * max(x2.max(initial=0.0), cn.max())
                )
                amb = np.where(part[:, 1] - part[:, 0] <= 2 * bound)[0]
                if len(amb):
                    exact = ((x[amb, None, :] - cm) ** 2).sum(axis=-1)
                    cell[amb] = exact.argmin(axis=1).astype("int32")
            yield pd.DataFrame({"vid": pdf["vid"], "v": pdf["v"], "cell": cell})

    rows = rows.mapInPandas(assign, "vid long, v array<double>, cell int")

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
    array_sort on (distance, cell) structs, slice. Ties break on cell id.

    The centroid matrix is ONE nested-array literal iterated with an
    index-lambda transform (not n_cells unrolled subtrees of dim literal
    nodes each — Catalyst analysis of those walls dominated the ANN
    queries' wall-clock). Same per-centroid L2 fold, same struct sort:
    bit-identical cells."""
    cents_lit = F.lit([[float(x) for x in c] for c in centroids])
    cells = F.transform(
        cents_lit,
        lambda cvec, i: F.struct(
            F.aggregate(
                F.zip_with(vec, cvec, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda s, x: s + x,
            ).alias("d"),
            i.alias("cell"),
        ),
    )
    nearest = F.slice(F.array_sort(cells), 1, nprobe)
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


def pq_train_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
    max_iter: int = 8,
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Train product-quantization codebooks (Jégou et al., TPAMI 2011):
    split the vector into ``m`` contiguous subspaces and k-means each
    subspace to ``ksub`` centroids. Returns codebooks[m][ksub][dsub].

    ONE Spark job, not m sequential fits: every vector explodes into m
    (subspace, subvector) rows, one shuffle groups by subspace, and each
    subspace's Lloyd iterations run as vectorized numpy inside its Arrow
    task — the m subspaces train in parallel. PQ codebooks train on a
    bounded SAMPLE by standard practice, so a per-subspace sample fits a
    task; if a subspace sample ever outgrows one task, fall back to a
    pyspark.ml fit per subspace (the k-means|| path ivf uses).
    Deterministic: seeded init on id-sorted rows."""
    import pandas as pd

    probe = corpus.select(_as_double(F.col(vec_col)).alias("v")).first()
    if probe is None or probe["v"] is None:
        raise ValueError(
            "pq_train_codebooks: empty corpus (or all-NULL vector column) "
            f"— nothing to train on in column {vec_col!r}"
        )
    dim = len(probe["v"])
    dsub = dim // m
    v = _as_double(F.col(vec_col))
    sub_rows = corpus.select(
        F.col(id_col).alias("vid"),
        F.posexplode_outer(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.slice(v, s * dsub + 1, dsub),
            )
        ).alias("subspace", "sv"),
    )

    def lloyd(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("vid").reset_index(drop=True)
        s = int(pdf["subspace"].iloc[0])
        x = np.stack(pdf["sv"].to_numpy())
        rng = np.random.RandomState(seed + s)
        # A subspace sample smaller than ksub cannot seed ksub distinct
        # centroids; sample with replacement rather than raising inside
        # the executor (duplicate seeds collapse to duplicate codewords,
        # still a valid — if redundant — codebook for a tiny corpus).
        replace = len(x) < ksub
        cent = x[rng.choice(len(x), size=ksub, replace=replace)].copy()
        for _ in range(max_iter):
            d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ksub):
                mask = assign == c
                if mask.any():
                    cent[c] = x[mask].mean(axis=0)
        return pd.DataFrame(
            {
                "subspace": s,
                "centroid_id": range(ksub),
                "centroid": [c.tolist() for c in cent],
            }
        )

    out = (
        sub_rows.groupBy("subspace")
        .applyInPandas(
            lloyd, "subspace int, centroid_id int, centroid array<double>"
        )
        .collect()
    )
    books: list[list[list[float]]] = [[None] * ksub for _ in range(m)]
    for r in out:
        books[r["subspace"]][r["centroid_id"]] = [float(x) for x in r["centroid"]]
    return books


def _pq_codes(vec: Column, books: list[list[list[float]]]) -> Column:
    """array<int>(m): per-subspace nearest-codeword ids — the PQ encoding,
    as a pure JVM expression (argmin over ksub squared-L2 distances per
    subspace). At scale this runs once at write time and the stored
    corpus carries only the m small ints per vector."""
    m = len(books)
    dsub = len(books[0][0])
    # one nested-array literal (m × ksub × dsub), index-lambda
    # transforms — not m·ksub unrolled subtrees (literal-wall tree-size
    # fix; same L2 folds, same struct-sort argmin, bit-identical codes)
    books_lit = F.lit([[[float(x) for x in cw] for cw in bk] for bk in books])
    return F.transform(
        books_lit,
        lambda book, s: F.element_at(
            F.array_sort(
                F.transform(
                    book,
                    lambda cvec, ci: F.struct(
                        F.aggregate(
                            F.zip_with(
                                F.slice(vec, s * dsub + 1, dsub),
                                cvec,
                                lambda x, y: (x - y) * (x - y),
                            ),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        ).alias("d"),
                        ci.alias("c"),
                    ),
                )
            ),
            1,
        )["c"],
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(neighbor_id, codes array<int>): the PQ-compressed corpus,
    MATERIALIZED (localCheckpoint). Encoding is at-ingest work — in
    production the stored table carries these m small ints per vector —
    and materializing also fences Catalyst from inlining the encode
    into every consumer join pair (the CollapseProject recompute trap:
    un-fenced, the ADC cross join re-encodes the corpus once per QUERY
    row). Arrow-batched numpy, per the dense-vector policy: the
    all-(sub)centroid distance argmin is one broadcasted tensor op per
    batch; the JVM-expression twin (_pq_codes) stays for single-vector
    use and as the equivalence reference."""
    import pandas as pd

    m = len(codebooks)
    dsub = len(codebooks[0][0])
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )

    def encode(batches):
        import numpy as np

        cent = np.array(codebooks)  # (m, ksub, dsub)
        for pdf in batches:
            x = np.stack(pdf["cv"].to_numpy())  # (n, dim)
            n = len(x)
            sub = x.reshape(n, m, dsub)  # (n, m, dsub)
            d2 = ((sub[:, :, None, :] - cent[None, :, :, :]) ** 2).sum(axis=3)
            codes = d2.argmin(axis=2).astype("int32")  # (n, m)
            yield pd.DataFrame(
                {"neighbor_id": pdf["neighbor_id"], "codes": list(codes)}
            )

    return c.mapInPandas(
        encode, "neighbor_id long, codes array<int>"
    ).localCheckpoint(eager=True)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    refine: int = 50,
    codebooks: list[list[list[float]]] | None = None,
    codes: DataFrame | None = None,
    seed: int = 42,
) -> DataFrame:
    """IVF-free PQ-ADC top-k: asymmetric-distance candidate scoring on
    compressed codes, exact re-rank of the top ``refine``.

    The scale property: the candidate-scoring join ships (id, codes[m])
    — m small ints per corpus vector, ~32× smaller than the raw floats —
    and the query side carries its m × ksub ADC lookup table as an array
    literal. Approximate distance is one zip_with over the codes
    (element_at into the table); only the ``refine`` survivors per query
    are joined back to the full vectors for exact cosine. Composes with
    the IVF cell filter (probe cells first, then ADC inside them)."""
    from pyspark.sql import Window

    if codebooks is None:
        codebooks = pq_train_codebooks(corpus, vec_col, m=m, ksub=ksub, seed=seed)
    dsub = len(codebooks[0][0])

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    coded = codes if codes is not None else pq_encode(corpus, codebooks, id_col, vec_col)

    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    # ADC tables: per subspace, squared L2 from the query SUB-vector to
    # each codeword — array<array<double>>(m × ksub), built per query
    # row from ONE nested-array codebook literal (the unrolled m·ksub
    # aggregate-subtree form made the plan a 68 KB literal wall whose
    # Catalyst analysis dominated the query; same folds, same order,
    # bit-identical table values).
    books_lit = F.lit(
        [[[float(x) for x in cw] for cw in bk] for bk in codebooks]
    )
    adc = F.transform(
        books_lit,
        lambda book, s: F.transform(
            book,
            lambda cvec: F.aggregate(
                F.zip_with(
                    F.slice(F.col("qv"), s * dsub + 1, dsub),
                    cvec,
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        ),
    )
    qt = q.select("query_id", "qv", adc.alias("adc"))

    approx = (
        qt.crossJoin(coded)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "qv",
            "neighbor_id",
            F.aggregate(
                F.zip_with(
                    F.col("codes"),
                    F.col("adc"),
                    lambda code, table: F.element_at(table, code + 1),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("approx_d2"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(F.asc("approx_d2"), F.asc("neighbor_id"))
    shortlist = approx.withColumn("rr", F.row_number().over(wr)).filter(
        F.col("rr") <= refine
    )
    rer = (
        shortlist.join(c, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
