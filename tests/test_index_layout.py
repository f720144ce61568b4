"""Materialized index layouts (queries/index_layout.py): the stored
cell-partitioned IVF corpus and the persisted bucketed band index must
(a) reproduce the recompute-based twins' results exactly and (b) keep
their pruning/co-location plan properties."""

import os
import re

import pyspark.sql.functions as F

from bigdatamanagement_spark.plans import executed_plan
from bigdatamanagement_spark.queries import ann_fixed, extensions, index_layout


def test_ivf_partitioned_probe_equals_recompute_twin(spark, sf_dir):
    got = index_layout.ivf_partitioned_probe(spark, sf_dir).collect()
    want = ann_fixed.ivf_ann_topk_fixed(spark, sf_dir).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert got, "probe must return rows"


def test_ivf_probe_prunes_partitions(spark, sf_dir):
    """The probed-cell literal must reach the scan as PartitionFilters
    (directory-level pruning), and Spark should stack dynamic partition
    pruning on the probe join."""
    plan = executed_plan(index_layout.ivf_partitioned_probe(spark, sf_dir))
    pf = re.findall(r"PartitionFilters: \[[^\]]*", plan)
    assert any("cell" in f and " IN " in f for f in pf), pf


def test_ivf_store_layout_is_cell_partitioned(spark, sf_dir):
    index_layout.ivf_partitioned_probe(spark, sf_dir)  # warm the store
    path = index_layout._ivf_store_path(spark, sf_dir)
    cells = sorted(d for d in os.listdir(path) if d.startswith("cell="))
    assert len(cells) >= 2, cells  # one directory per assigned cell


def test_incremental_persisted_index_equals_recompute(spark, sf_dir):
    got = index_layout.incremental_persisted_index(spark, sf_dir).collect()
    want = (
        extensions.incremental_neardup(spark, sf_dir)
        .orderBy("new_doc", "dup_of")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_persisted_band_index_scan_is_bucketed_and_shuffle_free(spark, sf_dir):
    """The stored index side must scan Bucketed: true with ZERO
    exchanges on the band key for the index side: at test scale the
    small batch side broadcasts (0 bkey exchanges total); at scale an
    SMJ would shuffle only the batch side into the stored bucketing —
    either way the persisted index never re-shuffles."""
    plan = executed_plan(index_layout.incremental_persisted_index(spark, sf_dir))
    assert "Bucketed: true" in plan, plan[:1500]
    assert len(re.findall(r"Exchange hashpartitioning\(bkey", plan)) <= 1


def test_band_index_collision_safety(spark, sf_dir):
    """Candidates from the composite-key join are a SUPERSET of the
    two-column band join's (hash collisions only add candidates);
    verification makes results equal — checked above — and every
    emitted pair meets the threshold."""
    out = index_layout.incremental_persisted_index(spark, sf_dir)
    assert out.filter(F.col("jaccard") < extensions.JACCARD_T).count() == 0


def test_ivfpq_incremental_equals_rebuild_twin(spark, sf_dir):
    """Append-only maintenance against frozen quantizers must equal the
    full rebuild (ext_ivfpq_ann_topk_fixed) exactly — and a SECOND call
    (store already appended) must return the same rows, proving the
    ingest is idempotent, not re-appending."""
    from bigdatamanagement_spark.queries import analytics57

    got = index_layout.ivfpq_incremental(spark, sf_dir).collect()
    want = analytics57.ivfpq_ann_topk_fixed(spark, sf_dir).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert got, "probe must return rows"
    again = index_layout.ivfpq_incremental(spark, sf_dir).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in got]


def test_ivfpq_incremental_prunes_partitions(spark, sf_dir):
    """The probed-cell literal must reach the code-store scan as
    PartitionFilters (directory pruning — nprobe as partition
    pruning)."""
    plan = executed_plan(index_layout.ivfpq_incremental(spark, sf_dir))
    pf = re.findall(r"PartitionFilters: \[[^\]]*", plan)
    assert any("cell" in f and " IN " in f for f in pf), pf


def test_ivfpq_store_holds_standing_plus_batch(spark, sf_dir):
    """After the incremental ingest the cell-partitioned store holds
    EVERY corpus vector's codes exactly once (standing + appended
    batch, no duplicates), 8 code rows per vector."""
    from bigdatamanagement_spark.queries.analytics57 import PQ_M

    index_layout.ivfpq_incremental(spark, sf_dir).collect()
    st = index_layout._ivfpq_store(spark, sf_dir)
    cells = sorted(d for d in os.listdir(st["path"]) if d.startswith("cell="))
    assert len(cells) >= 2, cells
    codes = spark.read.parquet(st["path"])
    per_vec = codes.groupBy("vec_id").count().collect()
    assert all(r["count"] == PQ_M for r in per_vec)
    n_corpus = (
        ann_fixed._quantized(spark, sf_dir)
        .filter(F.col("nrm") > 0)
        .count()
    )
    assert len(per_vec) == n_corpus
