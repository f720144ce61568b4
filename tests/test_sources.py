"""Property/round-trip tests for the ingest normalizers (S-01..S-04),
per SURVEY §5.2.4: round-trip, malformed-line drops, format parity."""

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    DoubleType, IntegerType, StringType, StructField, StructType,
)

from bigdatamanagement_spark.sources import (
    read_kv_text, read_scores_csv, read_tbl, read_weather_csv,
)

TBL_SCHEMA = StructType(
    [
        StructField("k", IntegerType()),
        StructField("name", StringType()),
        StructField("bal", DoubleType()),
    ]
)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),
            st.text(alphabet="abcXYZ #", min_size=0, max_size=12),
            st.floats(allow_nan=False, allow_infinity=False, width=32),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
def test_tbl_roundtrip(spark, tmp_path_factory, rows):
    path = str(tmp_path_factory.mktemp("tbl") / "t.tbl")
    with open(path, "w") as f:
        for k, name, bal in rows:
            f.write(f"{k}|{name}|{bal}|\n")
    got = sorted(
        (r.k, r.name or "", float(r.bal)) for r in read_tbl(spark, path, TBL_SCHEMA).collect()
    )
    want = sorted((k, name, float(f"{bal}")) for k, name, bal in rows)
    assert [g[0] for g in got] == [w[0] for w in want]
    assert all(abs(g[2] - w[2]) < 1e-6 * max(1, abs(w[2])) for g, w in zip(got, want))


def test_tbl_drops_malformed(spark, tmp_path):
    path = str(tmp_path / "t.tbl")
    with open(path, "w") as f:
        f.write("1|alpha|10.5|\n")
        f.write("not_an_int|beta|1.0|\n")  # malformed: int coercion fails
        f.write("3|gamma|2.5|\n")
    df = read_tbl(spark, path, TBL_SCHEMA)
    assert sorted(r.k for r in df.collect()) == [1, 3]


def test_weather_csv_skips_headers_and_parses(spark, tmp_path):
    path = str(tmp_path / "w.csv")
    with open(path, "w") as f:
        f.write("SeaTac Airport,,,,,,,,\n")
        f.write(" Pseudo-Julian-Date,Date,Time,Temperature,Dewpoint,Relhum,Speed,Gust,Pressure\n")
        f.write("2459492.87,2021-10-04,20:53,60,49,66.9,6,M,1013.6\n")
        f.write("2459492.912,2021-10-04,21:53,61,48,62.2,M,M,1012.5\n")
    df = read_weather_csv(spark, path, "SEA")
    rows = df.orderBy("time").collect()
    assert len(rows) == 2
    assert rows[0].station == "SEA"
    assert rows[0].temperature == 60
    assert rows[0].speed == "6" and rows[1].speed == "M"
    assert str(rows[0].date) == "2021-10-04"


def test_kv_text_parses_quoted_fields(spark, tmp_path):
    path = str(tmp_path / "users.txt")
    line = (
        ' "user:1" "first_name" "Mo" "last_name" "Ahern" "email" "m@x.com"'
        ' "gender" "male" "ip_address" "1.2.3.4" "country" "China"'
        ' "country_code" "CN" "city" "Yuanjue" "longitude" "105.324979"'
        ' "latitude" "29.55451" "last_login" "1581151007"'
    )
    with open(path, "w") as f:
        f.write(line + "\n\n")  # plus a blank line to skip
    rows = read_kv_text(spark, path).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.user_key == "user:1" and r.first_name == "Mo" and r.country == "China"
    assert abs(r.longitude - 105.324979) < 1e-9 and abs(r.latitude - 29.55451) < 1e-9


def test_scores_csv_drops_incomplete(spark, tmp_path):
    path = str(tmp_path / "scores.csv")
    with open(path, "w") as f:
        f.write("user:id,score,leaderboard\n")
        f.write("user:1,19,leaderboard:3\n")
        f.write("user:2,,leaderboard:3\n")  # incomplete → dropped
        f.write("user:3,bad,leaderboard:2\n")  # non-int → dropped
        f.write("user:4,487,leaderboard:2\n")
    rows = read_scores_csv(spark, path).orderBy("user_id").collect()
    assert [(r.user_id, r.score, r.leaderboard) for r in rows] == [
        ("user:1", 19, "leaderboard:3"),
        ("user:4", 487, "leaderboard:2"),
    ]


def test_schema_evolution_merge_read(spark, tmp_path):
    """Schema evolution on an append corpus: a later batch adds a
    column; mergeSchema unifies (old rows read NULL), and a pinned
    .schema() read prunes to the original columns — both directions a
    long-lived ingest pipeline needs."""
    import pyspark.sql.functions as F

    p = str(tmp_path / "evolving")
    spark.range(3).select(
        F.col("id").alias("doc_id"), F.lit("v1").alias("text")
    ).write.parquet(p)
    spark.range(3, 5).select(
        F.col("id").alias("doc_id"),
        F.lit("v2").alias("text"),
        F.lit("en").alias("lang"),
    ).write.mode("append").parquet(p)

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"doc_id", "text", "lang"}
    rows = {r["doc_id"]: r for r in merged.collect()}
    assert rows[0]["lang"] is None and rows[4]["lang"] == "en"

    pinned = spark.read.schema("doc_id long, text string").parquet(p)
    assert pinned.columns == ["doc_id", "text"]
    assert pinned.count() == 5


def test_adaptive_batch_size_tiers():
    """Behavior-matched to AmazonRedshift.java:375-387."""
    from bigdatamanagement_spark.sources.sinks import adaptive_batch_size

    assert adaptive_batch_size(10) == 500
    assert adaptive_batch_size(1_000) == 500
    assert adaptive_batch_size(1_001) == 1_000
    assert adaptive_batch_size(10_000) == 1_000
    assert adaptive_batch_size(10_001) == 2_000
    assert adaptive_batch_size(50_000) == 2_000
    assert adaptive_batch_size(50_001) == 5_000


def test_write_jdbc_batched_wires_options(spark):
    """No JDBC server in this container — assert the configured writer
    carries the adaptive batchsize and connection options (S-05)."""
    from bigdatamanagement_spark.sources.sinks import write_jdbc_batched

    df = spark.range(2_000)
    w = write_jdbc_batched(df, "jdbc:postgresql://db/x", "t")
    # DataFrameWriter keeps its options in the JVM-side scala map
    opts = {}
    it = w._jwrite.extraOptions().toList().iterator()
    while it.hasNext():
        e = it.next()
        opts[e._1()] = e._2()
    assert opts.get("batchsize") == "1000"  # adaptive tier for 2k rows
    assert opts.get("dbtable") == "t"
    assert opts.get("url", "").startswith("jdbc:postgresql")
