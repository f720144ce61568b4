"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — every implemented operator/query from SURVEY.md §2,
    merged from the bigdatamanagement_spark.queries packs.
``oracle_sql()`` — matching DuckDB SQL per query (same column aliases);
    queries absent here get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bigdatamanagement_spark.queries import (
    analytics,
    analytics2,
    analytics3,
    analytics4,
    analytics5,
    analytics6,
    analytics7,
    analytics8,
    analytics9,
    analytics10,
    analytics11,
    analytics12,
    analytics13,
    analytics14,
    analytics15,
    analytics16,
    analytics17,
    analytics18,
    analytics19,
    analytics20,
    analytics21,
    analytics22,
    analytics23,
    analytics24,
    analytics25,
    analytics26,
    analytics27,
    analytics28,
    analytics29,
    analytics30,
    analytics31,
    analytics32,
    analytics33,
    analytics34,
    analytics35,
    analytics36,
    analytics37,
    analytics38,
    analytics39,
    analytics40,
    analytics41,
    analytics42,
    analytics43,
    analytics44,
    analytics45,
    analytics46,
    analytics47,
    analytics48,
    analytics49,
    analytics50,
    analytics51,
    analytics52,
    analytics53,
    analytics54,
    analytics55,
    analytics56,
    analytics57,
    ann_fixed,
    events,
    extensions,
    index_layout,
    kv,
    mongo,
    music,
    mutation,
    ncaa,
    pipeline,
    quality,
    sampled,
    setops,
    sql4,
    stock,
    streaming_pack,
    tpch,
    tpch_full,
    traindata,
    weather,
)

_PACKS = [
    tpch,
    tpch_full,
    mongo,
    events,
    music,
    stock,
    weather,
    kv,
    ncaa,
    extensions,
    pipeline,
    mutation,
    streaming_pack,
    setops,
    traindata,
    quality,
    sampled,
    ann_fixed,
    index_layout,
    analytics,
    analytics2,
    analytics3,
    analytics4,
    analytics5,
    analytics6,
    analytics7,
    analytics8,
    analytics9,
    analytics10,
    analytics11,
    analytics12,
    analytics13,
    analytics14,
    analytics15,
    analytics16,
    analytics17,
    analytics18,
    analytics19,
    analytics20,
    analytics21,
    analytics22,
    analytics23,
    analytics24,
    analytics25,
    analytics26,
    analytics27,
    analytics28,
    analytics29,
    analytics30,
    analytics31,
    analytics32,
    analytics33,
    analytics34,
    analytics35,
    analytics36,
    analytics37,
    analytics38,
    analytics39,
    analytics40,
    analytics41,
    analytics42,
    analytics43,
    analytics44,
    analytics45,
    analytics46,
    analytics47,
    analytics48,
    analytics49,
    analytics50,
    analytics51,
    analytics52,
    analytics53,
    analytics54,
    analytics55,
    analytics56,
    analytics57,
    sql4,
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return tpch.lineitem_count_by_priority(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for pack in _PACKS:
        out.update(pack.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for pack in _PACKS:
        out.update(pack.ORACLE)
    return out
