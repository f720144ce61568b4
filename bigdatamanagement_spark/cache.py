"""Content-keyed cross-session artifact cache under <repo>/.bdm_cache.

The query families share once-per-corpus materialized substrates (the
MinHash pair graph, nested views, IVF/PQ code stores, trained
centroids, winnow fingerprints). In production these are at-ingest
index builds; per-session rebuilds billed ~32 s of memo_build time to
every bench session (round-6 verdict item: the centroid cache pattern
exists — extend it). This module is that pattern, generalized:

- content key = sha1 over each source parquet's (abspath, size, mtime)
  plus an algorithm-params string, so a regenerated corpus or changed
  constant rebuilds instead of serving a stale artifact;
- atomic publish: build into a pid-suffixed tmp path, os.rename into
  place — concurrent sessions race safely (the loser discards its tmp
  and reads the winner's);
- reload == built is pinned per memo by tests/test_cache_memos.py.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

CACHE_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bdm_cache"
)

# SPARK_GRAFT_ARTIFACT_CACHE selects where artifacts live:
#   fresh (DEFAULT) — per-process scratch root, reaped at interpreter
#     exit. Artifacts are built once and shared WITHIN one invocation
#     (bench cold+warm passes, one sim sweep), but nothing a previous
#     run persisted is ever served: every measured or oracle-checked
#     run computes from the parquet inputs.
#   persist — cross-session persistence under <repo>/.bdm_cache, the
#     at-ingest artifact semantics for long-lived engine/REPL sessions
#     (opt-in; never the default, so no benchmark or correctness run
#     can be fed by a prior run's outputs by accident).
_FRESH_ROOT: str | None = None


def _root() -> str:
    if os.environ.get("SPARK_GRAFT_ARTIFACT_CACHE", "fresh") == "persist":
        return CACHE_ROOT
    global _FRESH_ROOT
    if _FRESH_ROOT is None:
        from bigdatamanagement_spark.session import scratch_dir

        _FRESH_ROOT = scratch_dir("bdm_cache_fresh_")
    return _FRESH_ROOT


def content_key(
    sf_dir: str, tables: tuple[str, ...], params: str
) -> str | None:
    """Identity of (source tables, algorithm params); None when any
    source lacks a stable file to key on (then callers fall back to the
    in-session memo only)."""
    parts = []
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        try:
            st = os.stat(p)
        except OSError:
            return None
        parts.append(f"{os.path.abspath(p)}|{st.st_size}|{int(st.st_mtime)}")
    return hashlib.sha1(
        ("||".join(parts) + "##" + params).encode()
    ).hexdigest()[:16]


def artifact_path(memo_name: str, key: str) -> str:
    return os.path.join(_root(), memo_name, key)


def _publish_dir(tmp: str, final: str) -> None:
    """Promote tmp -> final; on a lost race, drop tmp and use the
    winner's artifact."""
    try:
        os.rename(tmp, final)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)


def persistent_df(
    spark: SparkSession,
    memo_name: str,
    sf_dir: str,
    tables: tuple[str, ...],
    params: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Parquet-backed cross-session memo for a DataFrame substrate.

    Cold: run ``build``, write parquet to the content-keyed dir, read
    back. Warm: one parquet scan (~ms planning, no recompute). Reading
    back even on the cold path means downstream plans are identical
    warm and cold, and nothing holds localCheckpoint blocks in executor
    memory across a long session (the round-6 rehearsal-inflation
    lesson)."""
    key = content_key(sf_dir, tables, params)
    if key is None:
        return build().localCheckpoint(eager=True)
    final = artifact_path(memo_name, key)
    if not os.path.isdir(final):
        os.makedirs(os.path.dirname(final), exist_ok=True)
        tmp = f"{final}.tmp{os.getpid()}"
        build().write.mode("overwrite").parquet(tmp)
        _publish_dir(tmp, final)
    return spark.read.parquet(final)


def persistent_built_dir(
    memo_name: str,
    sf_dir: str,
    tables: tuple[str, ...],
    params: str,
    build_into: Callable[[str], None],
) -> str:
    """Cross-session memo for a directory artifact written by the
    builder itself (partitioned/bucketed stores). Returns the final
    path; ``build_into(tmp_path)`` runs only on a cold cache."""
    key = content_key(sf_dir, tables, params)
    if key is None:
        # no stable identity: build into a throwaway keyed by pid
        final = artifact_path(memo_name, f"volatile{os.getpid()}")
        if not os.path.isdir(final):
            os.makedirs(os.path.dirname(final), exist_ok=True)
            build_into(final)
        return final
    final = artifact_path(memo_name, key)
    if not os.path.isdir(final):
        os.makedirs(os.path.dirname(final), exist_ok=True)
        tmp = f"{final}.tmp{os.getpid()}"
        build_into(tmp)
        _publish_dir(tmp, final)
    return final


def persistent_json(
    memo_name: str,
    sf_dir: str,
    tables: tuple[str, ...],
    params: str,
    build: Callable[[], object],
):
    """JSON-backed cross-session memo for small driver-side artifacts
    (trained centroids, codebooks — bounded metadata, never row data)."""
    key = content_key(sf_dir, tables, params)
    if key is None:
        return build()
    final = artifact_path(memo_name, key) + ".json"
    if os.path.exists(final):
        with open(final) as fh:
            return json.load(fh)
    value = build()
    os.makedirs(os.path.dirname(final), exist_ok=True)
    tmp = f"{final}.tmp{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(value, fh)
    os.replace(tmp, final)  # atomic: concurrent sessions race safely
    return value
