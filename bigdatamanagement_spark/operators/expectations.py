"""Declarative data-quality expectations over a set of tables — the
pre-ingest audit gate of a large pipeline (the Great-Expectations /
dbt-test capability class, engine-side). The reference's loaders enforce
constraints only implicitly, by coercion-and-skip at ingest
(`Assignment 7/MongoDB.java:150-157` typed appends, `Assignment
5/redis_client.py:129-137` incomplete-row skip) and by SQL DDL the remote
engines never actually verify (PK/FK clauses at
`Assignment 6/src/AmazonRedshift.java:119-206`); this operator turns those
declared-but-unchecked constraints into counted verdicts.

Check kinds and their evaluation shape (the scale story):
- ``row``     (violation predicate)       — ALL row checks of a table fold
  into ONE conditional aggregate, so a table is scanned once no matter how
  many checks it carries; at 100 TB the scan is the cost, the checks ride
  along as map-side sums.
- ``unique``  (PK/candidate key)          — count(*) − count(distinct key)
  in that same single aggregate (Spark rewrites the mixed distinct via
  Expand; still one scan).
- ``fk``      (referential integrity)     — a left-anti join against the
  parent's distinct keys, one shuffle per FK (broadcast when the parent is
  a dim); NULL child keys count as orphans, matching SQL NOT EXISTS.

Output: one row per check — (check_id, tbl, violations, status).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Mapping, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# A check is a tuple:
#   ("id", "table", "row", "<violation SQL predicate>")
#   ("id", "table", "unique", ["key_col", ...])
#   ("id", "child_table", "fk", ("child_col", "parent_table", "parent_col"))
Check = tuple[str, str, str, object]


def expectations_report(
    tables: Mapping[str, DataFrame], checks: Sequence[Check]
) -> DataFrame:
    scan_checks: dict[str, list[tuple[str, str, object]]] = defaultdict(list)
    fk_checks: list[Check] = []
    for cid, tbl, kind, arg in checks:
        if kind == "fk":
            fk_checks.append((cid, tbl, kind, arg))
        elif kind in ("row", "unique"):
            scan_checks[tbl].append((cid, kind, arg))
        else:
            raise ValueError(f"unknown check kind {kind!r} for {cid!r}")

    parts: list[DataFrame] = []
    for tbl, specs in scan_checks.items():
        aggs = []
        for cid, kind, arg in specs:
            if kind == "row":
                aggs.append(
                    F.sum(F.when(F.expr(arg), 1).otherwise(0)).cast("long").alias(cid)
                )
            else:  # unique
                aggs.append(
                    (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in arg]))
                    .cast("long")
                    .alias(cid)
                )
        one = tables[tbl].agg(*aggs)
        melted = one.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(cid).alias("check_id"),
                            F.lit(tbl).alias("tbl"),
                            F.col(cid).alias("violations"),
                        )
                        for cid, _, _ in specs
                    ]
                )
            ).alias("c")
        ).select("c.*")
        parts.append(melted)

    for cid, tbl, _, (child_col, parent_tbl, parent_col) in fk_checks:
        # Pre-aggregate child keys first (map-side combine collapses the
        # fact side to its key cardinality before any exchange), then
        # anti-join key-vs-key; violations = Σ occurrences of orphan keys.
        # NULL child keys never match, so they count as orphans — same as
        # SQL NOT EXISTS with an equality predicate.
        child_keys = (
            tables[tbl]
            .groupBy(F.col(child_col).alias("__k"))
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        parent_keys = tables[parent_tbl].select(F.col(parent_col)).distinct()
        orphans = child_keys.join(
            parent_keys, child_keys["__k"] == parent_keys[parent_col], "left_anti"
        )
        parts.append(
            orphans.agg(
                F.coalesce(F.sum("__n"), F.lit(0)).cast("long").alias("violations")
            ).select(F.lit(cid).alias("check_id"), F.lit(tbl).alias("tbl"), "violations")
        )

    report = parts[0]
    for p in parts[1:]:
        report = report.unionByName(p)
    return report.select(
        "check_id",
        "tbl",
        "violations",
        F.when(F.col("violations") == 0, F.lit("pass"))
        .otherwise(F.lit("fail"))
        .alias("status"),
    )
