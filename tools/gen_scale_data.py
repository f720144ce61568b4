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


REL_BASE = {
    "lineitem": 600_000,
    "orders": 150_000,
    "customer": 15_000,
    "part": 20_000,
    "supplier": 1_000,
}
SRC_SF01 = "/root/testdata/sf0.1"


def _resample_rows(table: str, cols: list[str], n: int,
                   rng: np.random.Generator) -> dict[str, np.ndarray]:
    """Jointly bootstrap-resample whole rows of sf0.1's non-key columns
    — intra-table correlations (returnflag<->linestatus<->prices, name
    vocab, categorical frequencies) match the driver's fixtures BY
    CONSTRUCTION, so tpch selectivities stay comparable across
    multipliers and the measured exponents are attributable to volume,
    not generator drift."""
    t = pq.read_table(os.path.join(SRC_SF01, f"{table}.parquet"), columns=cols)
    idx = rng.integers(0, t.num_rows, size=n)
    out = {}
    for c in cols:
        col = t[c].to_numpy(zero_copy_only=False)
        out[c] = col[idx]
    return out


def gen_relational(m: float, out: str, rng: np.random.Generator) -> None:
    """Scaled TPC-H-ish relational tables (round-5 item 1: the relational
    core's scale rehearsal). nation/region are fixed dims (copied
    verbatim); customer/supplier/part/orders scale by m; lineitem keeps
    sf0.1's empirical lines-per-order distribution; l_shipdate =
    o_orderdate + U(1, 95) days (preserves the causal date ordering the
    shipping-window predicates select on)."""
    import shutil

    for dim in ("nation", "region"):
        shutil.copyfile(
            os.path.join(SRC_SF01, f"{dim}.parquet"),
            os.path.join(out, f"{dim}.parquet"),
        )

    n_cust = int(REL_BASE["customer"] * m)
    cust = _resample_rows(
        "customer", ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
        n_cust, rng,
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(n_cust), pa.int64()),
                "c_name": pa.array(
                    [f"Customer#{i:09d}" for i in range(n_cust)]
                ),
                "c_nationkey": pa.array(cust["c_nationkey"], pa.int32()),
                "c_acctbal": pa.array(cust["c_acctbal"], pa.float64()),
                "c_mktsegment": pa.array(cust["c_mktsegment"].tolist()),
            }
        ),
        os.path.join(out, "customer.parquet"),
    )

    n_supp = int(REL_BASE["supplier"] * m)
    supp = _resample_rows("supplier", ["s_nationkey", "s_acctbal"], n_supp, rng)
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(range(n_supp), pa.int64()),
                "s_name": pa.array(
                    [f"Supplier#{i:09d}" for i in range(n_supp)]
                ),
                "s_nationkey": pa.array(supp["s_nationkey"], pa.int32()),
                "s_acctbal": pa.array(supp["s_acctbal"], pa.float64()),
            }
        ),
        os.path.join(out, "supplier.parquet"),
    )

    n_part = int(REL_BASE["part"] * m)
    part = _resample_rows(
        "part", ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
        n_part, rng,
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(range(n_part), pa.int64()),
                "p_name": pa.array(part["p_name"].tolist()),
                "p_brand": pa.array(part["p_brand"].tolist()),
                "p_type": pa.array(part["p_type"].tolist()),
                "p_size": pa.array(part["p_size"], pa.int32()),
                "p_retailprice": pa.array(part["p_retailprice"], pa.float64()),
            }
        ),
        os.path.join(out, "part.parquet"),
    )

    n_ord = int(REL_BASE["orders"] * m)
    orders = _resample_rows(
        "orders",
        ["o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
        n_ord, rng,
    )
    o_orderdate = orders["o_orderdate"].astype("datetime64[us]")
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(n_ord), pa.int64()),
                "o_custkey": pa.array(
                    rng.integers(0, n_cust, size=n_ord), pa.int64()
                ),
                "o_orderstatus": pa.array(orders["o_orderstatus"].tolist()),
                "o_totalprice": pa.array(orders["o_totalprice"], pa.float64()),
                "o_orderdate": pa.array(o_orderdate, pa.timestamp("us")),
                "o_orderpriority": pa.array(
                    orders["o_orderpriority"].tolist()
                ),
            }
        ),
        os.path.join(out, "orders.parquet"),
    )

    # lines-per-order: empirical histogram of sf0.1
    lpo = pq.read_table(
        os.path.join(SRC_SF01, "lineitem.parquet"), columns=["l_orderkey"]
    )["l_orderkey"].to_numpy(zero_copy_only=False)
    _, counts = np.unique(lpo, return_counts=True)
    per_order = rng.choice(counts, size=n_ord)
    n_line = int(per_order.sum())
    l_orderkey = np.repeat(np.arange(n_ord, dtype=np.int64), per_order)
    l_linenumber = np.concatenate(
        [np.arange(1, k + 1, dtype=np.int32) for k in per_order]
    )
    li = _resample_rows(
        "lineitem",
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax",
         "l_returnflag", "l_linestatus"],
        n_line, rng,
    )
    ship = (
        np.repeat(o_orderdate, per_order)
        + rng.integers(1, 96, size=n_line).astype("timedelta64[D]").astype(
            "timedelta64[us]"
        )
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(l_orderkey, pa.int64()),
                "l_partkey": pa.array(
                    rng.integers(0, n_part, size=n_line), pa.int64()
                ),
                "l_suppkey": pa.array(
                    rng.integers(0, n_supp, size=n_line), pa.int64()
                ),
                "l_linenumber": pa.array(l_linenumber, pa.int32()),
                "l_quantity": pa.array(li["l_quantity"], pa.float64()),
                "l_extendedprice": pa.array(
                    li["l_extendedprice"], pa.float64()
                ),
                "l_discount": pa.array(li["l_discount"], pa.float64()),
                "l_tax": pa.array(li["l_tax"], pa.float64()),
                "l_returnflag": pa.array(li["l_returnflag"].tolist()),
                "l_linestatus": pa.array(li["l_linestatus"].tolist()),
                "l_shipdate": pa.array(ship, pa.timestamp("us")),
            }
        ),
        os.path.join(out, "lineitem.parquet"),
    )
    print(f"relational m={m}: lineitem={n_line} orders={n_ord}"
          f" customer={n_cust} part={n_part} supplier={n_supp}")


def main() -> None:
    m = float(sys.argv[1])
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"/root/repo/fixtures/scale/m{sys.argv[1]}"
    )
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    if "--relational-only" in sys.argv:
        gen_relational(m, out, np.random.default_rng(4242))
        print(f"wrote m={m} (relational only) -> {out}")
        return
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
    if "--relational" in sys.argv:
        gen_relational(m, out, np.random.default_rng(4242))
    print(f"wrote m={m} -> {out}")


if __name__ == "__main__":
    main()
