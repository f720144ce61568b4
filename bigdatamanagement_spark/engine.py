"""Engine facade: the single entry surface described in SURVEY.md §3.4.

Two equivalent APIs (collapsing the reference's three entry-point
styles — SQL-string/JDBC, BSON pipeline builder, and client-side
procedural loops — into one declarative surface):

    eng.sql("SELECT ...")          # assignment 3/6 style (SQL string)
    eng.table("orders").filter(...)  # assignment 7 style (pipeline builder)

The reference's client-side procedural style (assignment 4/5 SCAN loops,
redis_client.py:233-269) is deliberately eliminated: those loops become
engine-side operators so they run distributed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.session import get_spark


class Engine:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.tables: dict[str, DataFrame] = {}

    @classmethod
    def local(cls, **kwargs) -> "Engine":
        return cls(get_spark(**kwargs))

    def register_testdata(self, sf_dir: str) -> "Engine":
        self.tables.update(load_testdata(self.spark, sf_dir))
        return self

    def register(self, name: str, df: DataFrame) -> "Engine":
        df.createOrReplaceTempView(name)
        self.tables[name] = df
        return self

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def table(self, name: str) -> DataFrame:
        return self.tables.get(name) or self.spark.table(name)

    def run_sql(self, query: str) -> pd.DataFrame:
        """In-process SQL runner returning a pandas frame.

        Parity with the reference notebook's ``runSql`` helper
        (Assignment 1 ipynb cell-3: sqlite3 → pd.read_sql_query).
        """
        return self.sql(query).toPandas()

    def explain_sql(self, query: str) -> dict:
        """Plan-health report for a SQL string (the engine's
        explain/format surface): broadcast vs shuffle joins, parquet
        pushdown, top-k short-circuits, codegen coverage, Python-UDF
        presence — the dict plans.plan_report builds for the
        plan-regression tests, exposed on the facade."""
        from bigdatamanagement_spark.plans import plan_report

        return plan_report(self.sql(query))

    def show_sql(self, query: str, n: int | None = 1000) -> None:
        """displayResultSet parity (SQLonRDS.java:280-361): boxed text
        table with computed column widths, NULL rendering, empty-result
        message, and the Total-results footer (see render.render_table).

        ``n`` bounds the driver-side collect (default 1000 — a facade
        default of None would collect the ENTIRE result set, a driver-OOM
        hazard at scale); pass ``n=None`` explicitly for bit-faithful
        uncapped reference parity."""
        from bigdatamanagement_spark.render import render_table

        print(render_table(self.sql(query), max_rows=n), end="")
