"""Golden fixtures for the multimodal decode paths (round-4 item 6).

INDEPENDENT reimplementation (pure python/numpy, no Spark, no imports
from the package) of the three deterministic decode queries over the
synth_media(64) table:

- multimodal_features: byte-bucket means of the payload (the decode
  stub's contract), rounded to 6 dp, stored float32;
- multimodal_frame_sample: every-4th payload chunk lengths per video;
- multimodal_audio_spectral: 16-bit PCM -> Hann-windowed rfft ->
  per-file RMS / ZCR / spectral-centroid means, stored float32.

Because the payloads are seeded SHA-256 bytes, the expected outputs are
constants; writing them from a SEPARATE implementation turns the three
rows-only registry entries into join-compare oracles (DuckDB reads the
golden parquet) that catch plumbing regressions — batching, schema,
type coercion — in the Spark mapInPandas paths.

Usage: python tools/gen_multimodal_golden.py   (writes fixtures/golden/)
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = "/root/repo/fixtures/golden"
N = 64
DIM = 8
EVERY_N = 4
# 64/32 (not the operator default 256/128): the synthetic payloads hold
# 64-144 PCM samples, so 256-sample windows would skip every file
FRAME_LEN, HOP = 64, 32


def media_rows():
    for i in range(N):
        kind = ("image", "audio", "video")[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 5)
        yield (
            i,
            kind,
            payload,
            64 + i % 32 if kind != "audio" else None,
            48 + i % 16 if kind != "audio" else None,
            16000 if kind == "audio" else None,
            (i % 7 + 1) * 8 if kind != "image" else None,
        )


def golden_features() -> pa.Table:
    ids, kinds, feats, nbytes = [], [], [], []
    for i, kind, payload, *_ in media_rows():
        buckets = [payload[j::DIM] for j in range(DIM)]
        feat = [round(sum(b) / max(len(b), 1) / 255.0, 6) for b in buckets]
        ids.append(i)
        kinds.append(kind)
        feats.append(np.array(feat, dtype=np.float32))
        nbytes.append(len(payload))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds),
            "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            "n_bytes": pa.array(nbytes, pa.int64()),
        }
    )


def golden_frames() -> pa.Table:
    ids, fis, fbytes = [], [], []
    for i, kind, payload, _w, _h, _sr, n_frames in media_rows():
        if kind != "video" or not n_frames:
            continue
        chunk = max(len(payload) // n_frames, 1)
        for fi in range(0, n_frames, EVERY_N):
            ids.append(i)
            fis.append(fi)
            fbytes.append(len(payload[fi * chunk : (fi + 1) * chunk]))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "frame_index": pa.array(fis, pa.int32()),
            "frame_bytes": pa.array(fbytes, pa.int64()),
        }
    )


def golden_audio() -> pa.Table:
    win = np.hanning(FRAME_LEN)
    out = {k: [] for k in ("media_id", "n_windows", "rms_mean", "zcr_mean", "centroid_hz_mean")}
    for i, kind, payload, _w, _h, sr, _nf in media_rows():
        if kind != "audio":
            continue
        raw = payload[: len(payload) - (len(payload) % 2)]
        pcm = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        if len(pcm) < FRAME_LEN:
            continue
        srf = float(sr or 16000)
        n_win = 1 + (len(pcm) - FRAME_LEN) // HOP
        idx = np.arange(FRAME_LEN)[None, :] + HOP * np.arange(n_win)[:, None]
        frames = pcm[idx]
        rms = np.sqrt((frames**2).mean(axis=1))
        zcr = (np.diff(np.signbit(frames), axis=1) != 0).mean(axis=1)
        spec = np.abs(np.fft.rfft(frames * win, axis=1))
        freqs = np.fft.rfftfreq(FRAME_LEN, d=1.0 / srf)
        denom = spec.sum(axis=1)
        denom[denom == 0] = 1.0
        centroid = (spec * freqs).sum(axis=1) / denom
        out["media_id"].append(i)
        out["n_windows"].append(int(n_win))
        out["rms_mean"].append(np.float32(rms.mean()))
        out["zcr_mean"].append(np.float32(zcr.mean()))
        out["centroid_hz_mean"].append(np.float32(centroid.mean()))
    return pa.table(
        {
            "media_id": pa.array(out["media_id"], pa.int64()),
            "n_windows": pa.array(out["n_windows"], pa.int32()),
            "rms_mean": pa.array(out["rms_mean"], pa.float32()),
            "zcr_mean": pa.array(out["zcr_mean"], pa.float32()),
            "centroid_hz_mean": pa.array(out["centroid_hz_mean"], pa.float32()),
        }
    )


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    pq.write_table(golden_features(), os.path.join(OUT, "multimodal_features.parquet"))
    pq.write_table(golden_frames(), os.path.join(OUT, "multimodal_frames.parquet"))
    pq.write_table(golden_audio(), os.path.join(OUT, "multimodal_audio.parquet"))
    print(f"wrote goldens -> {OUT}")


if __name__ == "__main__":
    main()
