"""Distributed readers for the reference's four source formats.

All four replace client-side line-loop parsers with Spark-native scans:
the parse runs in executors, so a 100 TB text dump ingests in parallel.
No Python UDFs — every tokenization is a built-in expression
(split / regexp_extract_all), JVM-side and codegen-friendly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_tbl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """S-01 — pipe-delimited TPC-H ``.tbl`` ingest with typed coercion.

    Reference behavior (MongoDB.java:129-160, 186-217): split on '|',
    Integer.parseInt / BigDecimal per field, skip blank/malformed lines.
    Spark: csv reader with sep='|' + DROPMALFORMED. ``.tbl`` files carry
    a trailing '|', which the csv reader sees as one extra empty column —
    handled by selecting only the schema's columns.
    """
    padded = StructType(schema.fields[:]).add("__trailing", "string")
    df = spark.read.csv(path, sep="|", schema=padded, mode="DROPMALFORMED")
    return df.select(*[f.name for f in schema.fields])


def read_weather_csv(spark: SparkSession, path: str, station: str) -> DataFrame:
    """S-02 — weather CSV ingest: 2 header lines, 9 columns, 'M' missing
    markers kept as strings (speed/gust), date/ints/doubles coerced.

    Reference behavior (Bigtable.java:94-113 spec; data seatac.csv:1-3).
    Header lines are dropped distributively: line 1 has empty trailing
    columns, line 2 has non-numeric first field — both fail the numeric
    coercion of pseudo_julian_date and are filtered, no driver-side
    line counting (which wouldn't scale to many files).
    """
    raw = spark.read.csv(
        path,
        schema=(
            "pseudo_julian_date string, date string, time string, temperature string,"
            " dewpoint string, relhum string, speed string, gust string, pressure string"
        ),
    )
    return (
        raw.filter(F.col("pseudo_julian_date").try_cast("double").isNotNull())
        .select(
            F.lit(station).alias("station"),
            F.col("pseudo_julian_date").try_cast("double").alias("pseudo_julian_date"),
            F.col("date").try_cast("date").alias("date"),
            F.trim("time").alias("time"),
            F.col("temperature").try_cast("int").alias("temperature"),
            F.col("dewpoint").try_cast("int").alias("dewpoint"),
            F.col("relhum").try_cast("double").alias("relhum"),
            F.trim("speed").alias("speed"),
            F.trim("gust").alias("gust"),
            F.col("pressure").try_cast("double").alias("pressure"),
        )
    )


_KV_FIELDS = (
    "user_key", "first_name", "last_name", "email", "gender", "ip_address",
    "country", "country_code", "city", "longitude", "latitude", "last_login",
)


def read_kv_text(spark: SparkSession, path: str) -> DataFrame:
    """S-03 — quoted key-value text ingest (users.txt).

    Reference behavior (redis_client.py:68-93): regex-tokenize quoted
    fields ``"([^"]*)"``, first token is the key, then alternating
    field-name/value pairs; longitude/latitude coerced to float.
    Spark: read.text + regexp_extract_all → positional array; values sit
    at odd positions 2,4,…,22 after the key at position 0.
    """
    lines = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    toks = lines.select(
        F.regexp_extract_all(F.col("value"), F.lit('"([^"]*)"'), 1).alias("t")
    ).filter(F.size("t") >= 23)
    cols = [F.col("t").getItem(0).alias(_KV_FIELDS[0])] + [
        F.col("t").getItem(2 * i).alias(_KV_FIELDS[i]) for i in range(1, len(_KV_FIELDS))
    ]
    out = toks.select(*cols)
    return out.withColumn("longitude", F.col("longitude").try_cast("double")).withColumn(
        "latitude", F.col("latitude").try_cast("double")
    )


def read_scores_csv(spark: SparkSession, path: str) -> DataFrame:
    """S-04 — headered scores CSV ingest (userscores.csv).

    Reference behavior (redis_client.py:116-141): DictReader with
    whitespace-stripped keys, score→int, skip incomplete rows.
    """
    raw = spark.read.csv(path, header=True, schema="`user:id` string, score string, leaderboard string")
    return (
        raw.select(
            F.trim(F.col("`user:id`")).alias("user_id"),
            F.col("score").try_cast("int").alias("score"),
            F.trim("leaderboard").alias("leaderboard"),
        )
        .na.drop(subset=["user_id", "score", "leaderboard"])
    )
