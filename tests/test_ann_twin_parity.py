"""Trained-ANN <-> oracle-twin mechanics parity (round-4 item 7).

The fixed-parameter twins (queries/ann_fixed.py) put the ANN index
MECHANICS under the DuckDB oracle gate using declarative literal
expressions. The trained production paths share those mechanics but run
them through different code: LSH buckets via one numpy matmul per Arrow
batch (similarity.lsh_table_buckets), IVF cells via the JVM
nearest_cells expression over pyspark.ml centroids. These tests close
the loop: the production numpy bucketing is BIT-IDENTICAL to the
declarative expression form on the same planes and corpus, and the IVF
probe matches an independent numpy recomputation — so the
oracle-checked shape and the production shape provably share behavior,
not just intent.
"""

import os

import numpy as np
import pyspark.sql.functions as F

from bigdatamanagement_spark.operators.similarity import (
    _as_double,
    _bucket,
    kmeans_centroids,
    lsh_table_buckets,
    nearest_cells,
    random_hyperplanes,
)

N_TABLES, N_PLANES, DIM = 4, 8, 64


def _embs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def test_trained_lsh_numpy_bucketing_equals_expression_path(spark, sf_dir):
    """The production (numpy mapInPandas) bucketing and the declarative
    _bucket expression (the ann_fixed twin shape) must agree on every
    (vector, table) with the SAME trained planes."""
    embs = _embs(spark, sf_dir)
    planes = [
        random_hyperplanes(DIM, N_PLANES, seed=42 + 1000 * t)
        for t in range(N_TABLES)
    ]
    prod = {
        (r["vid"], r["table"]): r["bucket"]
        for r in lsh_table_buckets(
            embs, planes, "vec_id", "embedding", "vid", "v"
        )
        .select("vid", "table", "bucket")
        .collect()
    }
    base = embs.select(
        F.col("vec_id").alias("vid"), _as_double(F.col("embedding")).alias("v")
    )
    expr = {}
    for t in range(N_TABLES):
        for r in base.select(
            "vid", _bucket(F.col("v"), planes[t]).alias("bucket")
        ).collect():
            expr[(r["vid"], t)] = r["bucket"]
    assert prod == expr
    n_vecs = embs.count()
    assert len(prod) == n_vecs * N_TABLES  # every vector, every table


def test_trained_ivf_cell_probe_matches_numpy(spark, sf_dir):
    """nearest_cells (the JVM expression the production IVF runs on both
    corpus and query sides) must match an independent numpy argsort of
    squared L2 with (distance, cell) tie-breaking, using the REAL
    pyspark.ml-trained centroids."""
    embs = _embs(spark, sf_dir)
    cents = kmeans_centroids(embs, "embedding", n_cells=8, seed=42)
    nprobe = 3
    got = {
        r["vec_id"]: list(r["cells"])
        for r in embs.select(
            "vec_id",
            nearest_cells(
                _as_double(F.col("embedding")), cents, nprobe
            ).alias("cells"),
        ).collect()
    }
    cm = np.array(cents)
    rows = embs.select("vec_id", "embedding").collect()
    for r in rows:
        x = np.array(r["embedding"], dtype=np.float64)
        d2 = ((cm - x) ** 2).sum(axis=1)
        order = sorted(range(len(cents)), key=lambda c: (d2[c], c))
        assert got[r["vec_id"]] == order[:nprobe], r["vec_id"]
