"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched mapInPandas.

The decode step is a DETERMINISTIC STUB (this container has no
image/audio codecs): ``_decode_stub`` derives pseudo pixel/sample
statistics from the payload bytes. Swap ``_decode_stub`` for a real
decoder (PIL / torchaudio / pyav) in production — the Spark-side
contract (schemas, batch iteration, partitioning) is identical and is
what's tested here.

Scale notes: payloads stay opaque bytes end-to-end; Spark shuffles only
metadata unless a stage touches the payload. mapInPandas streams Arrow
record batches through Python once per partition — the only
Python-boundary crossing in the engine, used exactly where built-in
expressions cannot express the semantics (codec work).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),  # image/video
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),  # audio
        StructField("n_frames", IntegerType()),  # video/audio
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("n_bytes", LongType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table (seeded payload bytes)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 5)
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                64 + i % 32 if kind != "audio" else None,
                48 + i % 16 if kind != "audio" else None,
                16000 if kind == "audio" else None,
                (i % 7 + 1) * 8 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_stub(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'decoded features': byte-bucket means.

    Replace with a real codec in production (e.g. PIL Image.open →
    np.asarray → channel statistics). Marked as a stub on purpose."""
    if not payload:
        return [0.0] * dim
    buckets = [payload[i::dim] for i in range(dim)]
    return [round(sum(b) / max(len(b), 1) / 255.0, 6) for b in buckets]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the payload column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [
                        _decode_stub(bytes(p) if p is not None else b"", dim)
                        for p in pdf["payload"]
                    ],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame.

    The stub slices the payload into ``n_frames`` equal chunks and emits
    every ``every_n``-th chunk; a real implementation would seek keyframes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "frame_index": [], "frame_payload": []}
            for _, row in pdf.iterrows():
                if row["kind"] != "video" or not row["n_frames"]:
                    continue
                payload = bytes(row["payload"])
                n = int(row["n_frames"])
                chunk = max(len(payload) // n, 1)
                for fi in range(0, n, every_n):
                    out["media_id"].append(row["media_id"])
                    out["frame_index"].append(fi)
                    out["frame_payload"].append(payload[fi * chunk : (fi + 1) * chunk])
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FRAME_SCHEMA)


def resize_metadata(media: DataFrame, max_side: int = 32) -> DataFrame:
    """'Resize' as a metadata transform (aspect-preserving clamp) — the
    payload re-encode is the stubbed codec step; the metadata math and
    column contract are the real, tested part."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side)
        / F.greatest(F.col("width").cast("double"), F.col("height").cast("double")),
    )
    return media.withColumn(
        "resized_width",
        F.when(F.col("width").isNotNull(), F.ceil(F.col("width") * scale).cast("int")),
    ).withColumn(
        "resized_height",
        F.when(F.col("height").isNotNull(), F.ceil(F.col("height") * scale).cast("int")),
    )
