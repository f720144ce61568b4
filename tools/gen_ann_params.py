"""Generate the shared fixed-ANN parameter fixture (round-5 judge item:
move the LCG-derived planes/centroids/codebooks out of inline literal
expressions into ONE parquet fixture both engines read).

Writes fixtures/ann_params/{planes,centroids,codebooks}.parquet from
the exact same Knuth-MMIX LCG streams that previously landed as inline
literals in queries/ann_fixed.py — so every fixed-ANN query's results
are bit-identical to the literal era, but the Spark plans become small
data-driven expressions (broadcast one-row / 128-row param tables)
instead of 1000+-node literal trees, and the DuckDB oracles become
read_parquet joins instead of VALUES walls.

tests/test_ann_fixed.py pins fixture content == the LCG constants so a
drifted regeneration fails loudly.

Usage: python tools/gen_ann_params.py   (writes fixtures/ann_params/)
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdatamanagement_spark.queries.ann_fixed import (  # noqa: E402
    ANN_PARAMS_DIR,
    CENTROIDS,
    N_CELLS,
    N_PLANES,
    N_TABLES,
    PLANES,
    PQ_CODEBOOKS,
    PQ_K,
    PQ_M,
)


def main() -> None:
    os.makedirs(ANN_PARAMS_DIR, exist_ok=True)
    arr64 = pa.list_(pa.int64())

    planes = pa.table(
        {
            "tbl": pa.array(
                [t for t in range(N_TABLES) for _ in range(N_PLANES)],
                pa.int32(),
            ),
            "j": pa.array(
                [j for _ in range(N_TABLES) for j in range(N_PLANES)],
                pa.int32(),
            ),
            "coefs": pa.array(
                [PLANES[t][j] for t in range(N_TABLES) for j in range(N_PLANES)],
                arr64,
            ),
        }
    )
    pq.write_table(planes, os.path.join(ANN_PARAMS_DIR, "planes.parquet"))

    cents = pa.table(
        {
            "cell": pa.array(range(N_CELLS), pa.int32()),
            "cv": pa.array(CENTROIDS, arr64),
        }
    )
    pq.write_table(cents, os.path.join(ANN_PARAMS_DIR, "centroids.parquet"))

    cbs = pa.table(
        {
            "m": pa.array(
                [m for m in range(PQ_M) for _ in range(PQ_K)], pa.int32()
            ),
            "k": pa.array(
                [k for _ in range(PQ_M) for k in range(PQ_K)], pa.int32()
            ),
            "cb": pa.array(
                [PQ_CODEBOOKS[m][k] for m in range(PQ_M) for k in range(PQ_K)],
                arr64,
            ),
        }
    )
    pq.write_table(cbs, os.path.join(ANN_PARAMS_DIR, "codebooks.parquet"))
    print(f"wrote {ANN_PARAMS_DIR}: planes={planes.num_rows} "
          f"centroids={cents.num_rows} codebooks={cbs.num_rows}")


if __name__ == "__main__":
    main()
