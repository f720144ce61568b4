"""Deterministic scale-rehearsal data generator (round-4 item 4).

Generates documents / embeddings / events parquet at a size MULTIPLIER
over the sf0.1 base shape (docs 5000m, embeddings 2000m, events
100000m), with the same schemas and matched distribution families as
the driver's testdata (measured from /root/testdata/sf0.1): the 31-word
vocabulary, 8-92-word doc lengths, 5-language / 20-source mix, a ~4.5%
planted near-duplicate rate (copy a recent doc, perturb 1-2 tail
tokens — sf0.1 shows 220 prefix-sharing pairs / 5000 docs), 10-label
64-dim unit-norm clustered embeddings, and a 30-day event stream with
users scaling alongside events.

The point is CONSISTENT statistics across multipliers so the observed
wall-time scaling exponents (tools/scale_rehearsal.py -> SCALE.md) are
attributable to data volume, not generator drift. NOT a substitute for
/root/testdata — oracles and correctness runs stay on the driver's
fixtures.

Usage: python tools/gen_scale_data.py <multiplier> [outdir]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "fr", "es", "de", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]
NEAR_DUP_P = 0.045
DIM = 64
N_LABELS = 10
BASE = {"documents": 5000, "embeddings": 2000, "events": 100_000}


def gen_documents(n: int, rng: np.random.Generator) -> pa.Table:
    texts: list[str] = []
    for i in range(n):
        if i > 0 and rng.random() < NEAR_DUP_P:
            src = texts[i - 1 - int(rng.integers(0, min(i, 100)))]
            toks = src.split(" ")
            for _ in range(int(rng.integers(1, 3))):
                pos = int(rng.integers(len(toks) // 2, len(toks)))
                toks[pos] = VOCAB[int(rng.integers(len(VOCAB)))]
            texts.append(" ".join(toks))
        else:
            ln = int(rng.integers(8, 93))
            idx = rng.integers(0, len(VOCAB), size=ln)
            texts.append(" ".join(VOCAB[j] for j in idx))
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs.tolist()),
            "source": pa.array([f"src{i % 20}" for i in range(n)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(n: int, rng: np.random.Generator) -> pa.Table:
    centers = rng.standard_normal((N_LABELS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, N_LABELS, size=n)
    x = 0.8 * centers[labels] + 0.45 * rng.standard_normal((n, DIM))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x = x.astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(x), pa.list_(pa.float32())),
            "label": pa.array(labels.astype(np.int32)),
        }
    )


def gen_events(n: int, rng: np.random.Generator, m: float) -> pa.Table:
    t0 = np.datetime64("2024-01-01T00:00:00.000000")
    span_us = 30 * 86_400 * 1_000_000
    ts = t0 + rng.integers(0, span_us, size=n).astype("timedelta64[us]")
    ts = np.sort(ts)
    n_users = max(1, int(1500 * m))
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(
                rng.integers(1, n_users + 1, size=n), pa.int64()
            ),
            "event_type": pa.array(
                rng.choice(EVENT_TYPES, size=n).tolist()
            ),
            "value": pa.array(
                np.round(rng.uniform(0, 200, size=n), 2), pa.float64()
            ),
            "props": pa.array(
                [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, size=n)]
            ),
        }
    )


def main() -> None:
    m = float(sys.argv[1])
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"/root/repo/fixtures/scale/m{sys.argv[1]}"
    )
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    pq.write_table(
        gen_documents(int(BASE["documents"] * m), rng),
        os.path.join(out, "documents.parquet"),
    )
    pq.write_table(
        gen_embeddings(int(BASE["embeddings"] * m), rng),
        os.path.join(out, "embeddings.parquet"),
    )
    pq.write_table(
        gen_events(int(BASE["events"] * m), rng, m),
        os.path.join(out, "events.parquet"),
    )
    print(f"wrote m={m} -> {out}")


if __name__ == "__main__":
    main()
