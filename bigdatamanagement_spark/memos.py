"""Registry of the engine's memoized-substrate builders.

Several query families share a once-per-(session, corpus) materialized
substrate — the MinHash pair graph, nested views, persisted IVF/PQ code
stores, trained centroids. Each is memoized at first touch, which is
the right production shape (an index build at ingest time), but it
billed ~173 s of first-touch cost to whichever query happened to run
first in a bench pass: round-5 cold numbers were useless for
round-over-round comparison (t01 "cold" 6.3 s vs 0.34 s warm, none of
it t01's plan).

bench.py runs every builder here BEFORE the cold pass and records each
as its own ``memo_build:<name>`` line, so per-query cold times measure
the query's plan and nothing else. Builders are idempotent (they hit
the same memo the queries hit) and each swallows missing-table corpora
(a testdata dir without the extension tables skips that builder).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import SparkSession


def _band_index(spark: SparkSession, sf_dir: str) -> None:
    from bigdatamanagement_spark.queries.index_layout import band_index_table

    band_index_table(spark, sf_dir)


def _ivf_store(spark: SparkSession, sf_dir: str) -> None:
    from bigdatamanagement_spark.queries.index_layout import _ivf_store_path

    _ivf_store_path(spark, sf_dir)


def _ivfpq_store(spark: SparkSession, sf_dir: str) -> None:
    from bigdatamanagement_spark.queries.index_layout import _ivfpq_store

    _ivfpq_store(spark, sf_dir)


def _ivf_centroids(spark: SparkSession, sf_dir: str) -> None:
    from bigdatamanagement_spark.queries.extensions import (
        _embs,
        _ivf_centroids,
    )

    _ivf_centroids(spark, sf_dir, _embs(spark, sf_dir))


def _semdedup_centroids(spark: SparkSession, sf_dir: str) -> None:
    from bigdatamanagement_spark.queries.extensions import (
        _embs,
        _semdedup_centroids,
    )

    _semdedup_centroids(spark, sf_dir, _embs(spark, sf_dir))


def _lexical_pair_graph(spark: SparkSession, sf_dir: str) -> None:
    from bigdatamanagement_spark.queries.pipeline import _neardup_pairs

    _neardup_pairs(spark, sf_dir)


def _simhash_pair_graph(spark: SparkSession, sf_dir: str) -> None:
    from bigdatamanagement_spark.queries.extensions import _simhash_pair_graph

    _simhash_pair_graph(spark, sf_dir)


def _fuzzy_pair_graph(spark: SparkSession, sf_dir: str) -> None:
    from bigdatamanagement_spark.queries.extensions import _fuzzy_pair_graph

    _fuzzy_pair_graph(spark, sf_dir)


def _cluster_labels(spark: SparkSession, sf_dir: str) -> None:
    from bigdatamanagement_spark.queries.pipeline import _cluster_labels

    _cluster_labels(spark, sf_dir)


def _repetition(spark: SparkSession, sf_dir: str) -> None:
    from bigdatamanagement_spark.queries.pipeline import _repetition

    _repetition(spark, sf_dir)


def _winnow_fingerprints(spark: SparkSession, sf_dir: str) -> None:
    from bigdatamanagement_spark.queries.analytics50 import _fps

    _fps(spark, sf_dir)


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> None:
    from bigdatamanagement_spark.queries.analytics7 import _copurchase_edges

    _copurchase_edges(spark, sf_dir)


def _nested_custorders(spark: SparkSession, sf_dir: str) -> None:
    from bigdatamanagement_spark.queries.mongo import custorders

    custorders(spark, sf_dir)


def _nested_custorderitems(spark: SparkSession, sf_dir: str) -> None:
    from bigdatamanagement_spark.queries.mongo import custorderitems

    custorderitems(spark, sf_dir)


def _bpe_merges(spark: SparkSession, sf_dir: str) -> None:
    from bigdatamanagement_spark.queries.analytics import _bpe_merges_rows

    _bpe_merges_rows(spark, sf_dir)


def _t77_postings(spark: SparkSession, sf_dir: str) -> None:
    from bigdatamanagement_spark.queries.analytics59 import _postings

    _postings(spark, sf_dir)


# name -> builder; names become `memo_build:<name>` bench lines.
MEMO_BUILDERS: dict[str, Callable[[SparkSession, str], None]] = {
    "band_index": _band_index,
    "ivf_store": _ivf_store,
    "ivfpq_store": _ivfpq_store,
    "ivf_centroids": _ivf_centroids,
    "semdedup_centroids": _semdedup_centroids,
    "lexical_pair_graph": _lexical_pair_graph,
    "simhash_pair_graph": _simhash_pair_graph,
    "fuzzy_pair_graph": _fuzzy_pair_graph,
    "cluster_labels": _cluster_labels,
    "repetition_metrics": _repetition,
    "winnow_fingerprints": _winnow_fingerprints,
    "copurchase_edges": _copurchase_edges,
    "nested_custorders": _nested_custorders,
    "nested_custorderitems": _nested_custorderitems,
    "t77_postings": _t77_postings,
    "bpe_merges": _bpe_merges,
}


def build_all(
    spark: SparkSession, sf_dir: str
) -> tuple[dict[str, float], dict[str, str]]:
    """Run every builder, returning (name -> seconds, name -> error).

    Only EXPECTED absences skip silently-ish (stderr note): a corpus
    without the extension tables raises AnalysisException or
    FileNotFoundError from the reader, and that's by design. Any other
    exception is a real builder regression — it is recorded in the
    second dict so the bench artifact carries a ``memo_build_failed``
    block CI can surface, instead of silently re-billing the substrate's
    first-touch cost to the first query that needs it (the exact
    mis-attribution this module exists to fix)."""
    import sys
    import time

    from pyspark.errors import AnalysisException

    out: dict[str, float] = {}
    failed: dict[str, str] = {}
    for name, fn in MEMO_BUILDERS.items():
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir)
        except (AnalysisException, FileNotFoundError) as exc:
            # corpus lacks this substrate's source tables — by design
            print(
                f"memo_build:{name} skipped: {type(exc).__name__}: "
                f"{str(exc)[:200]}",
                file=sys.stderr,
            )
            continue
        except Exception as exc:  # unexpected: a real builder regression
            failed[name] = f"{type(exc).__name__}: {str(exc)[:300]}"
            print(
                f"memo_build:{name} FAILED: {failed[name]}",
                file=sys.stderr,
            )
            continue
        out[name] = round(time.perf_counter() - t0, 3)
    return out, failed
