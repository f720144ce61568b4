"""Shared pytest fixtures: one SparkSession, a DuckDB oracle, and a
canonicalizing comparator mirroring the driver's check (row-count +
schema-by-name + order-insensitive value comparison)."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

from bigdatamanagement_spark.catalog import TESTDATA_TABLES
from bigdatamanagement_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="bdm-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        path = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


def _norm(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NULL>"
        return f"{v:.6g}"
    if hasattr(v, "isoformat"):
        if getattr(v, "tzinfo", None) is not None:
            import datetime as _dt

            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canonicalize(rows: list[dict]) -> tuple[list[str], list[tuple]]:
    """Rows (dicts) -> (sorted column names, sorted normalized row tuples)."""
    if not rows:
        return [], []
    cols = sorted(rows[0].keys())
    out = sorted(tuple(_norm(r[c]) for c in cols) for r in rows)
    return cols, out


def assert_matches_oracle(spark_df, duck_con, oracle_sql: str):
    """Run the Spark plan and the DuckDB SQL; compare via Arrow so date/
    timestamp/decimal types are represented identically on both sides."""
    got_cols, got = canonicalize(spark_df.toArrow().to_pylist())
    want_cols, want = canonicalize(duck_con.execute(oracle_sql).arrow().to_pylist())
    if got or want:
        assert got_cols == want_cols, (
            f"schema mismatch: spark={got_cols} oracle={want_cols}"
        )
    assert len(got) == len(want), f"row count mismatch: spark={len(got)} oracle={len(want)}"
    for i, (g, w) in enumerate(zip(got, want)):
        if g != w:
            raise AssertionError(
                f"value mismatch at canonical row {i}:\n  spark : {g}\n  oracle: {w}"
            )
