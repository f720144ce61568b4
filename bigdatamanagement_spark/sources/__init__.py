"""Ingest normalizers (SURVEY §2.1 S-01..S-04): distributed readers for
the reference's source formats — pipe-delimited .tbl, 2-header weather
CSV, quoted key-value text, and headered scores CSV."""

from bigdatamanagement_spark.sources.readers import (
    read_kv_text,
    read_scores_csv,
    read_tbl,
    read_weather_csv,
)

__all__ = ["read_tbl", "read_weather_csv", "read_kv_text", "read_scores_csv"]
