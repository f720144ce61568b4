"""Plumbing tests for the multimodal operators (decode is a deterministic
stub; schema/batching/partition behavior is the real subject)."""

import pyspark.sql.functions as F

from bigdatamanagement_spark.operators import multimodal as M


def test_feature_extraction_shapes(spark):
    media = M.synth_media(spark, 48)
    feats = M.extract_features(media, dim=8)
    rows = feats.collect()
    assert len(rows) == 48
    assert all(len(r.feature) == 8 for r in rows)
    assert all(0.0 <= x <= 1.0 for r in rows for x in r.feature)
    assert all(r.n_bytes > 0 for r in rows)


def test_feature_extraction_deterministic(spark):
    media = M.synth_media(spark, 16)
    a = {r.media_id: r.feature for r in M.extract_features(media).collect()}
    b = {r.media_id: r.feature for r in M.extract_features(media).collect()}
    assert a == b


def test_frame_sampling(spark):
    media = M.synth_media(spark, 30)
    frames = M.sample_frames(media, every_n=4)
    rows = frames.collect()
    assert rows, "video rows must produce frames"
    n_frames = {r.media_id: r.n_frames for r in media.filter("kind='video'").collect()}
    from collections import Counter

    per_media = Counter(r.media_id for r in rows)
    for mid, cnt in per_media.items():
        expected = len(range(0, n_frames[mid], 4))
        assert cnt == expected
    assert all(r.frame_index % 4 == 0 for r in rows)
    assert all(len(bytes(r.frame_payload)) > 0 for r in rows)


def test_resize_metadata(spark):
    media = M.synth_media(spark, 24)
    resized = M.resize_metadata(media, max_side=32)
    for r in resized.filter(F.col("width").isNotNull()).collect():
        assert max(r.resized_width, r.resized_height) <= 32
        # aspect ratio approximately preserved (ceil rounding)
        assert abs(r.resized_width / r.resized_height - r.width / r.height) < 0.2
    for r in resized.filter(F.col("width").isNull()).collect():
        assert r.resized_width is None


def test_partitioning_survives_map(spark):
    media = M.synth_media(spark, 64).repartition(8)
    feats = M.extract_features(media)
    assert feats.rdd.getNumPartitions() == 8


def test_audio_spectral_pure_sine_centroid(spark):
    """REAL DSP check: a pure 2 kHz sine at 16 kHz must yield a spectral
    centroid near 2 kHz (Hann leakage keeps it within a bin or two) and
    a zero-crossing rate near 2*f/sr."""
    import numpy as np

    from bigdatamanagement_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_spectral_features,
    )

    sr, f, n = 16000, 2000.0, 4096
    t = np.arange(n) / sr
    pcm = (np.sin(2 * np.pi * f * t) * 0.5 * 32767).astype("<i2")
    rows = [(1, "audio", bytearray(pcm.tobytes()), None, None, sr, None)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = audio_spectral_features(media).collect()
    assert len(out) == 1
    r = out[0]
    assert abs(r["centroid_hz_mean"] - f) < 150, r["centroid_hz_mean"]
    assert abs(r["zcr_mean"] - 2 * f / sr) < 0.02, r["zcr_mean"]
    assert 0.3 < r["rms_mean"] < 0.4  # 0.5 amplitude sine -> rms ~0.354


def test_audio_spectral_window_count(spark):
    """n_windows follows 1 + (n_samples - frame) // hop exactly."""
    import numpy as np

    from bigdatamanagement_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_spectral_features,
    )

    n = 1000
    pcm = (np.zeros(n)).astype("<i2")
    media = spark.createDataFrame(
        [(7, "audio", bytearray(pcm.tobytes()), None, None, 16000, None)],
        MEDIA_SCHEMA,
    )
    out = audio_spectral_features(media, frame_len=256, hop=128).collect()
    assert out[0]["n_windows"] == 1 + (n - 256) // 128
