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


SPECTRAL_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_windows", IntegerType()),
        StructField("rms_mean", FloatType()),
        StructField("zcr_mean", FloatType()),
        StructField("centroid_hz_mean", FloatType()),
    ]
)


def audio_spectral_features(
    media: DataFrame, frame_len: int = 256, hop: int = 128
) -> DataFrame:
    """REAL audio DSP, no codec needed: payload bytes are interpreted as
    16-bit little-endian PCM and each file gets windowed-FFT spectral
    features — per-window RMS energy, zero-crossing rate, and spectral
    centroid (Hz, via the row's sample_rate), averaged per file. Unlike
    the image/video decode (stubbed: container has no codecs), raw-PCM
    analysis is fully implementable with numpy — windowing, Hann taper,
    rfft — so this operator is not a stub; its DSP is pinned by a
    pure-sine test whose centroid must land on the sine frequency.

    One Arrow batch crossing; frames are a strided view (no copy);
    output is O(files), not O(windows)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        win = np.hanning(frame_len)
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "n_windows": [], "rms_mean": [],
                "zcr_mean": [], "centroid_hz_mean": [],
            }
            for _, row in pdf.iterrows():
                if row["kind"] != "audio" or row["payload"] is None:
                    continue
                raw = bytes(row["payload"])
                pcm = np.frombuffer(
                    raw[: len(raw) - (len(raw) % 2)], dtype="<i2"
                ).astype(np.float64) / 32768.0
                if len(pcm) < frame_len:
                    continue
                sr = float(row["sample_rate"] or 16000)
                n_win = 1 + (len(pcm) - frame_len) // hop
                idx = np.arange(frame_len)[None, :] + hop * np.arange(n_win)[:, None]
                frames = pcm[idx]
                rms = np.sqrt((frames**2).mean(axis=1))
                zcr = (np.diff(np.signbit(frames), axis=1) != 0).mean(axis=1)
                spec = np.abs(np.fft.rfft(frames * win, axis=1))
                freqs = np.fft.rfftfreq(frame_len, d=1.0 / sr)
                denom = spec.sum(axis=1)
                denom[denom == 0] = 1.0
                centroid = (spec * freqs).sum(axis=1) / denom
                out["media_id"].append(row["media_id"])
                out["n_windows"].append(int(n_win))
                out["rms_mean"].append(float(rms.mean()))
                out["zcr_mean"].append(float(zcr.mean()))
                out["centroid_hz_mean"].append(float(centroid.mean()))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, SPECTRAL_SCHEMA)
