"""Differential SQL fuzzer: Spark vs DuckDB on the same parquet tables.

The 478-query registry is enumerative — it proves the declared queries,
not the semantic corners between them. This tool generates seeded random
queries from a dual-dialect ANSI grammar (projections, filters with
null-heavy literals, FK joins, grouped aggregates, HAVING, deterministic
windows, set ops, scalar subqueries) over the driver's testdata schema,
runs each statement on BOTH engines, and compares results with the same
order-insensitive canonicalization the driver uses (sorted column names,
normalized sorted row tuples).

Round-6 grammar families (the corners where engines actually disagree):
- outer joins: LEFT/FULL NULL-extension — COUNT(col) vs COUNT(*), NULL
  group rows, anti-join shapes, ON-clause vs WHERE-clause filters;
- nested array/struct: explode/unnest flattening, array indexing
  (emitted as a DIALECT PAIR — Spark is 0-based, DuckDB 1-based),
  size()/len(), struct build + dotted access;
- DECIMAL near width edges: (19,0)x(19,0) -> 38-digit derivation,
  scale-preserving SUMs, string-cast rounding at the half boundary
  (values compared scale-insensitively).

Determinism rules baked into the grammar (so a divergence means a real
semantics bug, not an ordering artifact):
- no LIMIT/OFFSET; comparison is order-insensitive;
- no SUM/AVG over raw doubles (order-dependent low bits) — doubles are
  cent-quantized to BIGINT first (the repo-wide discipline); MIN/MAX on
  doubles is allowed (no arithmetic);
- ROW_NUMBER/LAG windows always order by a unique key; RANK/DENSE_RANK
  and RANGE-frame sums may order by non-unique columns (peers tie);
- division always lands on NULLIF(_, 0) (ANSI Spark errors on /0);
- string concat uses || (both engines: NULL if either side NULL —
  concat() differs between engines on NULLs).

Usage:
    python tools/fuzz_differential.py --seed 20260816 --n 100
    python tools/fuzz_differential.py --seed 1 --n 50 --sf-dir /root/testdata/sf0.001

Exit 0 = all match; exit 1 = divergences (each printed with its SQL so
it can be frozen into a regression fixture). A pinned-seed pytest run
lives in tests/test_fuzz_differential.py.
"""

from __future__ import annotations

import argparse
import math
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --------------------------------------------------------------------------
# Schema (matches /root/testdata/sf*/; see TESTDATA.md)
# --------------------------------------------------------------------------

SCHEMA: dict[str, dict[str, list[str]]] = {
    "lineitem": {
        "int": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        "num": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "str": ["l_returnflag", "l_linestatus"],
        "ts": ["l_shipdate"],
        # the SYNTHETIC lineitem has duplicate (l_orderkey, l_linenumber)
        # pairs (unlike real TPC-H), so it has NO unique key: windows that
        # need a total order (ROW_NUMBER/LAG/ROWS-frame sums) must skip it
        # — with ties, intra-tie order is engine-arbitrary and a running
        # sum legitimately differs (found by seed 4242 before this guard).
        "unique": [],
    },
    "orders": {
        "int": ["o_orderkey", "o_custkey"],
        "num": ["o_totalprice"],
        "str": ["o_orderstatus", "o_orderpriority"],
        "ts": ["o_orderdate"],
        "unique": ["o_orderkey"],
    },
    "customer": {
        "int": ["c_custkey", "c_nationkey"],
        "num": ["c_acctbal"],
        "str": ["c_name", "c_mktsegment"],
        "ts": [],
        "unique": ["c_custkey"],
    },
    "part": {
        "int": ["p_partkey", "p_size"],
        "num": ["p_retailprice"],
        "str": ["p_name", "p_brand", "p_type"],
        "ts": [],
        "unique": ["p_partkey"],
    },
    "supplier": {
        "int": ["s_suppkey", "s_nationkey"],
        "num": ["s_acctbal"],
        "str": ["s_name"],
        "ts": [],
        "unique": ["s_suppkey"],
    },
    "nation": {
        "int": ["n_nationkey", "n_regionkey"],
        "num": [],
        "str": ["n_name"],
        "ts": [],
        "unique": ["n_nationkey"],
    },
    "region": {
        "int": ["r_regionkey"],
        "num": [],
        "str": ["r_name"],
        "ts": [],
        "unique": ["r_regionkey"],
    },
    "events": {
        "int": ["event_id", "user_id"],
        "num": ["value"],
        "str": ["event_type"],
        "ts": ["ts"],
        "unique": ["event_id"],
    },
    "documents": {
        "int": ["doc_id", "n_chars"],
        "str": ["lang", "source"],
        "num": [],
        "ts": [],
        "unique": ["doc_id"],
    },
}

# FK pairs (left_table, right_table, left_key, right_key)
JOINS = [
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
    ("lineitem", "part", "l_partkey", "p_partkey"),
    ("lineitem", "supplier", "l_suppkey", "s_suppkey"),
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("customer", "nation", "c_nationkey", "n_nationkey"),
    ("supplier", "nation", "s_nationkey", "n_nationkey"),
    ("nation", "region", "n_regionkey", "r_regionkey"),
]

INT_LITS = ["0", "1", "-1", "2", "5", "42", "100", "1000", "999999"]
STR_LITS = ["''", "'A'", "'O'", "'F'", "'BUILDING'", "'zzz'", "'en'", "'web'"]
TS_LITS = [
    "TIMESTAMP '1995-06-15 00:00:00'",
    "TIMESTAMP '1997-01-01 00:00:00'",
    "TIMESTAMP '1992-03-03 12:00:00'",
    "TIMESTAMP '2024-01-05 00:00:00'",
]
NUM_LITS = ["0.0", "1.5", "-2.25", "10.0", "5000.0", "0.05"]


class Gen:
    """Seeded query generator. Every statement is valid, deterministic
    SQL in both Spark SQL and DuckDB."""

    def __init__(self, seed: int):
        self.r = random.Random(seed)

    # -- scalar expressions (depth-limited) --------------------------------

    def int_expr(self, t: str, depth: int = 0) -> str:
        cols = SCHEMA[t]["int"]
        r = self.r
        if depth >= 2 or r.random() < 0.45:
            return r.choice(cols) if r.random() < 0.8 else r.choice(INT_LITS)
        pick = r.randrange(8)
        a = self.int_expr(t, depth + 1)
        b = self.int_expr(t, depth + 1)
        if pick == 0:
            return f"(CAST({a} AS BIGINT) + CAST({b} AS BIGINT))"
        if pick == 1:
            return f"(CAST({a} AS BIGINT) - CAST({b} AS BIGINT))"
        if pick == 2:
            return f"(CAST({a} AS BIGINT) * {r.choice(['2', '3', '-1', '7'])})"
        if pick == 3:
            return f"(CAST({a} AS BIGINT) % {r.choice(['7', '13', '97'])})"
        if pick == 4:
            return f"ABS(CAST({a} AS BIGINT))"
        if pick == 5:
            return (
                f"(CASE WHEN {self.pred(t, depth + 1)} THEN {a}"
                f" ELSE {b} END)"
            )
        if pick == 6:
            return f"COALESCE(NULLIF({a}, {r.choice(INT_LITS)}), {b})"
        return f"LENGTH({self.str_expr(t, depth + 1)})"

    def str_expr(self, t: str, depth: int = 0) -> str:
        cols = SCHEMA[t]["str"]
        r = self.r
        if not cols:
            return r.choice(STR_LITS)
        if depth >= 2 or r.random() < 0.5:
            return r.choice(cols) if r.random() < 0.85 else r.choice(STR_LITS)
        pick = r.randrange(4)
        a = self.str_expr(t, depth + 1)
        if pick == 0:
            return f"UPPER({a})"
        if pick == 1:
            return f"LOWER({a})"
        if pick == 2:
            return f"SUBSTR({a}, 1, {r.choice(['1', '2', '3', '5'])})"
        return f"({a} || {r.choice(STR_LITS)})"

    def pred(self, t: str, depth: int = 0) -> str:
        r = self.r
        if depth < 2 and r.random() < 0.35:
            a = self.pred(t, depth + 1)
            b = self.pred(t, depth + 1)
            op = r.choice(["AND", "OR"])
            neg = "NOT " if r.random() < 0.2 else ""
            return f"{neg}(({a}) {op} ({b}))"
        pick = r.randrange(10)
        if pick in (0, 1):  # int comparison
            op = r.choice(["=", "<>", "<", "<=", ">", ">="])
            return f"{self.int_expr(t, 2)} {op} {r.choice(INT_LITS)}"
        if pick == 2 and SCHEMA[t]["num"]:
            op = r.choice(["<", "<=", ">", ">=", "=", "<>"])
            return f"{r.choice(SCHEMA[t]['num'])} {op} {r.choice(NUM_LITS)}"
        if pick == 3 and SCHEMA[t]["str"]:
            col = r.choice(SCHEMA[t]["str"])
            if r.random() < 0.5:
                pat = r.choice(["'A%'", "'%a%'", "'%e'", "'B%g'"])
                return f"{col} LIKE {pat}"
            op = r.choice(["=", "<>", "<", ">"])
            return f"{col} {op} {r.choice(STR_LITS)}"
        if pick == 4 and SCHEMA[t]["ts"]:
            col = r.choice(SCHEMA[t]["ts"])
            if r.random() < 0.5:
                a, b = sorted(r.sample(TS_LITS, 2))
                return f"{col} BETWEEN {a} AND {b}"
            return f"{col} {r.choice(['<', '>=', '<>'])} {r.choice(TS_LITS)}"
        if pick == 5:
            col = r.choice(SCHEMA[t]["int"])
            lits = ", ".join(r.sample(INT_LITS, r.randrange(2, 5)))
            neg = "NOT " if r.random() < 0.3 else ""
            return f"{col} {neg}IN ({lits})"
        if pick == 6:
            col = r.choice(
                SCHEMA[t]["int"] + SCHEMA[t]["str"] + SCHEMA[t]["num"]
            )
            return f"{col} IS {'NOT ' if r.random() < 0.5 else ''}NULL"
        if pick == 7:
            a, b = self.int_expr(t, 2), sorted(
                [int(r.choice(INT_LITS)), int(r.choice(INT_LITS))]
            )
            return f"{a} BETWEEN {b[0]} AND {b[1]}"
        if pick == 8 and SCHEMA[t]["ts"]:
            col = r.choice(SCHEMA[t]["ts"])
            part = r.choice(["YEAR", "MONTH", "DAY"])
            return (
                f"EXTRACT({part} FROM {col}) ="
                f" {r.choice(['1995', '1997', '3', '6', '15'])}"
            )
        # division with guarded denominator (ANSI Spark errors on /0)
        a = self.int_expr(t, 2)
        b = self.int_expr(t, 2)
        return f"(CAST({a} AS DOUBLE) / NULLIF(CAST({b} AS DOUBLE), 0.0)) > 2.0"

    # quantized BIGINT face of a double column (exact on both engines)
    def cents(self, col: str) -> str:
        return f"CAST(ROUND(CAST({col} AS DOUBLE) * 100, 0) AS BIGINT)"

    def agg_expr(self, t: str) -> str:
        r = self.r
        pick = r.randrange(8)
        if pick == 0:
            return "COUNT(*)"
        if pick == 1:
            return f"COUNT({r.choice(SCHEMA[t]['int'] + SCHEMA[t]['str'])})"
        if pick == 2:
            return f"COUNT(DISTINCT {r.choice(SCHEMA[t]['int'] + SCHEMA[t]['str'])})"
        if pick == 3:
            return f"SUM(CAST({self.int_expr(t, 1)} AS BIGINT))"
        if pick == 4 and SCHEMA[t]["num"]:
            return f"SUM({self.cents(r.choice(SCHEMA[t]['num']))})"
        if pick == 5:
            col = r.choice(
                SCHEMA[t]["int"] + SCHEMA[t]["str"] + SCHEMA[t]["num"]
                + SCHEMA[t]["ts"]
            )
            return f"{r.choice(['MIN', 'MAX'])}({col})"
        if pick == 6:
            return f"AVG(CAST({r.choice(SCHEMA[t]['int'])} AS BIGINT))"
        return f"SUM(CASE WHEN {self.pred(t, 1)} THEN 1 ELSE 0 END)"

    def group_key(self, t: str) -> str:
        r = self.r
        opts = []
        if SCHEMA[t]["str"]:
            opts.append(r.choice(SCHEMA[t]["str"]))
        if SCHEMA[t]["ts"]:
            col = r.choice(SCHEMA[t]["ts"])
            opts.append(f"EXTRACT({r.choice(['YEAR', 'MONTH'])} FROM {col})")
        opts.append(f"({r.choice(SCHEMA[t]['int'])} % {r.choice(['2', '5', '10'])})")
        return r.choice(opts)

    # -- statements --------------------------------------------------------

    def _from_clause(self) -> tuple[str, str]:
        """(table-for-columns, FROM ... clause). Joined tables expose the
        union of both column sets via a merged pseudo-table entry."""
        r = self.r
        if r.random() < 0.35:
            lt, rt, lk, rk = r.choice(JOINS)
            how = r.choice(["JOIN", "LEFT JOIN", "JOIN", "JOIN"])
            key = f"__join__{lt}__{rt}"
            if key not in SCHEMA:
                merged = {
                    k: SCHEMA[lt][k] + SCHEMA[rt][k]
                    for k in ("int", "num", "str", "ts")
                }
                # LEFT JOIN makes right-side "unique" cols nullable and
                # non-unique per left row; unique keys stay left-only
                merged["unique"] = SCHEMA[lt]["unique"]
                SCHEMA[key] = merged
            return key, f"{lt} {how} {rt} ON {lk} = {rk}"
        t = r.choice(list(k for k in SCHEMA if not k.startswith("__join__")))
        return t, t

    def exists_stmt(self) -> str:
        """Correlated (NOT) EXISTS over an FK pair — the decorrelation
        path both engines must agree on."""
        r = self.r
        lt, rt, lk, rk = r.choice(JOINS)
        neg = r.choice(["", "NOT "])
        inner_pred = self.pred(rt, 1)
        outer = r.choice(SCHEMA[lt]["int"])
        return (
            f"SELECT COUNT(*) AS n,"
            f" COALESCE(SUM(CAST({outer} AS BIGINT)), 0) AS s"
            f" FROM {lt} WHERE {neg}EXISTS (SELECT 1 FROM {rt}"
            f" WHERE {rt}.{rk} = {lt}.{lk} AND ({inner_pred}))"
        )

    def rollup_stmt(self) -> str:
        """GROUP BY ROLLUP/CUBE — super-aggregate NULL rows exercise
        grouping-set semantics."""
        r = self.r
        t, frm = self._from_clause()
        k1, k2 = self.group_key(t), self.group_key(t)
        op = r.choice(["ROLLUP", "CUBE"])
        aggs = [self.agg_expr(t) for _ in range(r.randrange(1, 3))]
        cols = ", ".join(
            [f"{k1} AS g0", f"{k2} AS g1"]
            + [f"{a} AS a{i}" for i, a in enumerate(aggs)]
        )
        where = f" WHERE {self.pred(t)}" if r.random() < 0.7 else ""
        return (
            f"SELECT {cols} FROM {frm}{where}"
            f" GROUP BY {op}({k1}, {k2})"
        )

    def cte_stmt(self) -> str:
        """WITH chain: filtered base -> aggregate over it."""
        r = self.r
        t = r.choice([k for k in SCHEMA if not k.startswith("__join__")])
        p1 = self.pred(t, 1)
        gk = self.group_key(t)
        agg = self.agg_expr(t)
        having = (
            f" HAVING COUNT(*) > {r.choice(['0', '1', '3'])}"
            if r.random() < 0.4
            else ""
        )
        return (
            f"WITH base AS (SELECT * FROM {t} WHERE {p1}) "
            f"SELECT {gk} AS g0, {agg} AS a0, COUNT(*) AS n"
            f" FROM base GROUP BY 1{having}"
        )

    def outer_join_stmt(self) -> str:
        """Outer-join NULL-extension corners (round-6 grammar family):
        LEFT / FULL joins where the interesting behavior is what happens
        to the null-extended side — COUNT(col) vs COUNT(*), grouping by
        a null-extended key (the NULL group row), IS NULL anti-join
        shapes, and the ON-clause-vs-WHERE-clause filter placement
        distinction (a WHERE filter on the right side silently turns a
        left join back into an inner join — engines must agree)."""
        r = self.r
        lt, rt, lk, rk = r.choice(JOINS)
        inner_pred = self.pred(rt, 1)
        shape = r.randrange(5)
        if shape == 0:
            # anti-join: left rows with no (filtered) right match
            return (
                f"SELECT COUNT(*) AS n,"
                f" COALESCE(SUM(CAST({lk} AS BIGINT)), 0) AS s"
                f" FROM {lt} LEFT JOIN (SELECT * FROM {rt}"
                f" WHERE {inner_pred}) r ON {lk} = r.{rk}"
                f" WHERE r.{rk} IS NULL"
            )
        if shape == 1:
            # COUNT(*) counts null-extended rows; COUNT(right col) skips
            gk = self.group_key(lt)
            return (
                f"SELECT {gk} AS g0, COUNT(*) AS n_all,"
                f" COUNT(r.{rk}) AS n_matched,"
                f" SUM(CASE WHEN r.{rk} IS NULL THEN 1 ELSE 0 END)"
                f" AS n_unmatched"
                f" FROM {lt} LEFT JOIN (SELECT * FROM {rt}"
                f" WHERE {inner_pred}) r ON {lk} = r.{rk}"
                f" GROUP BY 1"
            )
        if shape == 2:
            # grouping by the null-extended RIGHT side key: the NULL
            # group collects every unmatched left row
            rgk = (
                r.choice(SCHEMA[rt]["str"])
                if SCHEMA[rt]["str"]
                else f"CAST(r.{rk} % 5 AS BIGINT)"
            )
            rgk = f"r.{rgk}" if not rgk.startswith("CAST") else rgk
            return (
                f"SELECT {rgk} AS g0, COUNT(*) AS n"
                f" FROM {lt} LEFT JOIN (SELECT * FROM {rt}"
                f" WHERE {inner_pred}) r ON {lk} = r.{rk}"
                f" GROUP BY 1"
            )
        if shape == 3:
            # FULL OUTER with both sides filtered: rows fall in LEFT-only,
            # RIGHT-only, and matched buckets — engines must agree on all
            left_pred = self.pred(lt, 1)
            return (
                f"SELECT COUNT(*) AS n,"
                f" SUM(CASE WHEN l.{lk} IS NULL THEN 1 ELSE 0 END)"
                f" AS right_only,"
                f" SUM(CASE WHEN r.{rk} IS NULL THEN 1 ELSE 0 END)"
                f" AS left_only"
                f" FROM (SELECT * FROM {lt} WHERE {left_pred}) l"
                f" FULL JOIN (SELECT * FROM {rt} WHERE {inner_pred}) r"
                f" ON l.{lk} = r.{rk}"
            )
        # extra ON-clause predicate (join-time filter) vs the same
        # predicate in WHERE (post-join filter) — materially different
        # results under LEFT JOIN; compare each against DuckDB
        on_extra = self.pred(rt, 1)
        in_where = r.random() < 0.5
        if in_where:
            return (
                f"SELECT COUNT(*) AS n, COUNT({rt}.{rk}) AS m"
                f" FROM {lt} LEFT JOIN {rt} ON {lk} = {rk}"
                f" WHERE ({on_extra}) OR {rt}.{rk} IS NULL"
            )
        return (
            f"SELECT COUNT(*) AS n, COUNT({rt}.{rk}) AS m"
            f" FROM {lt} LEFT JOIN {rt} ON {lk} = {rk}"
            f" AND ({on_extra})"
        )

    def nested_stmt(self) -> tuple[str, str]:
        """Nested array/struct corners (round-6): returns a
        (spark_sql, duckdb_sql) DIALECT PAIR — same semantics, per-engine
        syntax — because this is exactly the family where surface syntax
        differs: explode vs UNNEST, 0- vs 1-based array indexing,
        size() vs len(), named_struct vs struct literals. The
        order-insensitive row-multiset compare makes value-only unnest
        deterministic."""
        r = self.r
        shape = r.randrange(4)
        if shape == 0:
            # value-only flatten + aggregate (multiset must match)
            g = r.choice(["vec_id % 7", "vec_id % 3", "label"])
            spark = (
                f"SELECT {g} AS g0, COUNT(*) AS n,"
                f" MIN(val) AS mn, MAX(val) AS mx FROM"
                f" (SELECT vec_id, label, explode(embedding) AS val"
                f" FROM embeddings) t GROUP BY 1"
            )
            duck = (
                f"SELECT {g} AS g0, COUNT(*) AS n,"
                f" MIN(val) AS mn, MAX(val) AS mx FROM"
                f" (SELECT vec_id, label, unnest(embedding) AS val"
                f" FROM embeddings) t GROUP BY 1"
            )
            return spark, duck
        if shape == 1:
            # the classic: Spark arrays are 0-based, DuckDB 1-based
            k = r.randrange(0, 8)
            pred = f"vec_id % {r.choice(['2', '5'])} = 0"
            spark = (
                f"SELECT vec_id AS k, embedding[{k}] AS c0"
                f" FROM embeddings WHERE {pred}"
            )
            duck = (
                f"SELECT vec_id AS k, embedding[{k + 1}] AS c0"
                f" FROM embeddings WHERE {pred}"
            )
            return spark, duck
        if shape == 2:
            # array length + a length-derived filter
            n = r.choice(["0", "16", "64"])
            spark = (
                f"SELECT COUNT(*) AS n, MIN(size(embedding)) AS mn,"
                f" MAX(size(embedding)) AS mx FROM embeddings"
                f" WHERE size(embedding) > {n}"
            )
            duck = (
                f"SELECT COUNT(*) AS n, MIN(len(embedding)) AS mn,"
                f" MAX(len(embedding)) AS mx FROM embeddings"
                f" WHERE len(embedding) > {n}"
            )
            return spark, duck
        # struct build + dotted field access (documents)
        f1, f2 = "lang", "n_chars"
        pred = self.pred("documents", 1)
        spark = (
            f"SELECT named_struct('a', {f1}, 'b', {f2}).a AS c0,"
            f" SUM(named_struct('a', {f1}, 'b', {f2}).b) AS c1,"
            f" COUNT(*) AS n FROM documents WHERE {pred} GROUP BY 1"
        )
        duck = (
            f"SELECT ({{'a': {f1}, 'b': {f2}}}).a AS c0,"
            f" SUM(({{'a': {f1}, 'b': {f2}}}).b) AS c1,"
            f" COUNT(*) AS n FROM documents WHERE {pred} GROUP BY 1"
        )
        return spark, duck

    def decimal_stmt(self) -> str:
        """Exact DECIMAL arithmetic near type-width edges (round-6):
        max-precision derivations (19,0 x 19,0 -> 38), scale-preserving
        SUMs, string-cast rounding at the half boundary. Magnitudes are
        chosen to stay inside DECIMAL(38) on BOTH engines (Spark ANSI
        errors on true overflow; DuckDB rejects >38-wide derived types)
        — the corners exercised are type derivation and rounding, with
        values compared scale-insensitively (canonical decimal string)."""
        r = self.r
        shape = r.randrange(4)
        if shape == 0:
            t = r.choice(["lineitem", "orders", "customer", "part"])
            col = r.choice(SCHEMA[t]["num"])
            gk = self.group_key(t)
            return (
                f"SELECT {gk} AS g0,"
                f" SUM(CAST({col} AS DECIMAL(18,2))) AS a0,"
                f" COUNT(*) AS n FROM {t} GROUP BY 1"
            )
        if shape == 1:
            # 19,0 x 19,0 -> the full 38-digit width on both engines
            t = r.choice(["orders", "customer", "supplier"])
            col = r.choice(SCHEMA[t]["int"])
            lit = r.choice(
                ["999999999999999", "1000000000000000", "123456789012345"]
            )
            return (
                f"SELECT COUNT(*) AS n,"
                f" MIN(CAST({col} AS DECIMAL(19,0))"
                f" * CAST({lit} AS DECIMAL(19,0))) AS mn,"
                f" MAX(CAST({col} AS DECIMAL(19,0))"
                f" * CAST({lit} AS DECIMAL(19,0))) AS mx"
                f" FROM {t}"
            )
        if shape == 2:
            # decimal x decimal products, scale 2+2 -> 4
            return (
                "SELECT l_returnflag AS g0,"
                " SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
                " * CAST(l_discount AS DECIMAL(18,2))) AS a0,"
                " COUNT(*) AS n FROM lineitem GROUP BY 1"
            )
        # string-cast rounding at the exact half boundary
        lit = r.choice(["'123.455'", "'-123.455'", "'0.005'", "'99.995'"])
        t = r.choice(["nation", "region"])
        k = SCHEMA[t]["int"][0]
        return (
            f"SELECT {k} AS k,"
            f" CAST({lit} AS DECIMAL(10,2)) AS c0,"
            f" CAST({lit} AS DECIMAL(10,1)) AS c1 FROM {t}"
        )

    def interval_stmt(self) -> str:
        """Timestamp interval arithmetic across an FK join (shipdate vs
        orderdate + INTERVAL)."""
        r = self.r
        days = r.choice(["7", "30", "60", "90"])
        cmp = r.choice(["<", ">", "<=", ">="])
        return (
            f"SELECT COUNT(*) AS n,"
            f" COUNT(DISTINCT l_orderkey) AS d"
            f" FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
            f" WHERE l_shipdate {cmp} o_orderdate + INTERVAL {days} DAY"
        )

    def lateral_stmt(self) -> str:
        """Correlated LATERAL subquery in FROM (round-7 family): the
        registry exercises LATERAL but the grammar didn't. The lateral
        body is always an aggregate (exactly one row per outer row —
        COUNT + COALESCE'd BIGINT SUM), so comma-LATERAL and LEFT JOIN
        LATERAL are semantically identical and deterministic; the outer
        query aggregates per group so output stays bounded."""
        r = self.r
        lt, rt, lk, rk = r.choice(JOINS)
        inner_pred = self.pred(rt, 1)
        agg_col = r.choice(SCHEMA[rt]["int"])
        gk = self.group_key(lt)
        lat = (
            f"(SELECT COUNT(*) AS lc,"
            f" COALESCE(SUM(CAST({agg_col} AS BIGINT)), 0) AS ls"
            f" FROM {rt} WHERE {rt}.{rk} = {lt}.{lk}"
            f" AND ({inner_pred}))"
        )
        join = r.choice(
            [f", LATERAL {lat} l", f" LEFT JOIN LATERAL {lat} l ON TRUE"]
        )
        where = f" WHERE {self.pred(lt)}" if r.random() < 0.5 else ""
        return (
            f"SELECT {gk} AS g0, COUNT(*) AS n,"
            f" SUM(l.lc) AS slc, SUM(l.ls) AS sls,"
            f" SUM(CASE WHEN l.lc = 0 THEN 1 ELSE 0 END) AS n_childless"
            f" FROM {lt}{join}{where} GROUP BY 1"
        )

    def recursive_stmt(self) -> str:
        """WITH RECURSIVE (round-7 family; Spark 4 feature the registry
        uses but the grammar didn't). Three bounded shapes: a seq
        spine joined to a fact's modulo bucket, a scalar accumulation,
        and a string-growth chain — each with a strict depth bound so
        both engines terminate identically."""
        r = self.r
        k = r.choice([3, 4, 5, 7, 10])
        shape = r.randrange(3)
        if shape == 0:
            t, col = r.choice(
                [
                    ("lineitem", "l_linenumber"),
                    ("orders", "o_custkey"),
                    ("events", "user_id"),
                    ("customer", "c_nationkey"),
                ]
            )
            agg = self.agg_expr(t)
            return (
                f"WITH RECURSIVE seq(n) AS (SELECT 1 UNION ALL"
                f" SELECT n+1 FROM seq WHERE n < {k})"
                f" SELECT s.n AS g0, COUNT(*) AS n_rows, {agg} AS a0"
                f" FROM seq s JOIN {t} ON CAST({col} % {k + 1} AS INT) = s.n"
                f" GROUP BY 1"
            )
        if shape == 1:
            step = r.choice(["s+n", "s*2", "s+n*n"])
            return (
                f"WITH RECURSIVE r(n, s) AS (SELECT 1, CAST(1 AS BIGINT)"
                f" UNION ALL SELECT n+1, {step} FROM r WHERE n < {k})"
                f" SELECT MAX(s) AS m, MIN(s) AS mn,"
                f" SUM(s) AS t, COUNT(*) AS c FROM r"
            )
        ch = r.choice(["'x'", "'ab'", "'-'"])
        return (
            f"WITH RECURSIVE r(n, t) AS (SELECT 1, {ch} UNION ALL"
            f" SELECT n+1, t || {ch} FROM r WHERE n < {k})"
            f" SELECT MAX(t) AS m, COUNT(*) AS c,"
            f" SUM(CAST(LENGTH(t) AS BIGINT)) AS lt FROM r"
        )

    def variant_stmt(self) -> tuple[str, str]:
        """VARIANT / parse_json dialect pair (round-7 family): Spark
        parses the events `props` JSON into a VARIANT and extracts with
        variant_get; DuckDB extracts with json_extract_string + CAST.
        Shapes: typed extraction with grouped aggregates, missing-path
        NULL semantics, and a build-then-extract roundtrip
        (to_json(named_struct) vs json_object)."""
        r = self.r
        shape = r.randrange(3)
        if shape == 0:
            s_k = "variant_get(parse_json(props), '$.k', 'long')"
            d_k = "CAST(json_extract_string(props, '$.k') AS BIGINT)"
            cmp = r.choice(["> 50", "<= 10", "% 7 = 0", "BETWEEN 20 AND 60"])
            tail = (
                " AS k FROM events) SELECT event_type, COUNT(k) AS nk,"
                " SUM(k) AS sk, MIN(k) AS mnk, MAX(k) AS mxk,"
                f" SUM(CASE WHEN k {cmp} THEN 1 ELSE 0 END) AS n_hit"
                " FROM v GROUP BY event_type"
            )
            return (
                f"WITH v AS (SELECT event_type, {s_k}{tail}",
                f"WITH v AS (SELECT event_type, {d_k}{tail}",
            )
        if shape == 1:
            path = r.choice(["'$.missing'", "'$.k.nested'"])
            s_m = f"variant_get(parse_json(props), {path}, 'string')"
            d_m = f"json_extract_string(props, {path})"
            tail = (
                " AS m, user_id FROM events) SELECT COUNT(m) AS n_present,"
                " COUNT(*) AS n, COUNT(DISTINCT user_id) AS u FROM v"
            )
            return (
                f"WITH v AS (SELECT {s_m}{tail}",
                f"WITH v AS (SELECT {d_m}{tail}",
            )
        icol = r.choice(["user_id", "event_id"])
        s_b = (
            f"variant_get(parse_json(to_json(named_struct("
            f"'a', {icol}, 'b', event_type))), '$.a', 'long')"
        )
        d_b = (
            f"CAST(json_extract_string(json_object("
            f"'a', {icol}, 'b', event_type), '$.a') AS BIGINT)"
        )
        s_t = (
            "variant_get(parse_json(to_json(named_struct("
            "'t', event_type))), '$.t', 'string')"
        )
        d_t = (
            "json_extract_string(json_object('t', event_type), '$.t')"
        )
        tail = (
            " SELECT COUNT(*) AS n, SUM(a) AS sa,"
            " COUNT(DISTINCT t) AS dt FROM v"
        )
        return (
            f"WITH v AS (SELECT {s_b} AS a, {s_t} AS t FROM events){tail}",
            f"WITH v AS (SELECT {d_b} AS a, {d_t} AS t FROM events){tail}",
        )

    def statement(self) -> str | tuple[str, str]:
        """One statement: a plain string runs verbatim on both engines;
        a (spark_sql, duckdb_sql) tuple is a dialect pair (nested
        array/struct and VARIANT families — same semantics, per-engine
        syntax)."""
        r = self.r
        extra = r.randrange(29)
        if extra == 0:
            return self.exists_stmt()
        if extra == 1:
            return self.rollup_stmt()
        if extra == 2:
            return self.cte_stmt()
        if extra == 3:
            return self.interval_stmt()
        if extra in (4, 5):
            return self.outer_join_stmt()
        if extra in (6, 7):
            return self.nested_stmt()
        if extra in (8, 9):
            return self.decimal_stmt()
        if extra == 26:
            return self.lateral_stmt()
        if extra == 27:
            return self.recursive_stmt()
        if extra == 28:
            return self.variant_stmt()
        kind = r.randrange(10)
        t, frm = self._from_clause()
        where = f" WHERE {self.pred(t)}" if r.random() < 0.8 else ""
        if kind < 4:  # grouped aggregate
            nkeys = r.randrange(1, 3)
            keys = [self.group_key(t) for _ in range(nkeys)]
            aggs = [self.agg_expr(t) for _ in range(r.randrange(1, 4))]
            cols = ", ".join(
                [f"{k} AS g{i}" for i, k in enumerate(keys)]
                + [f"{a} AS a{i}" for i, a in enumerate(aggs)]
            )
            having = (
                f" HAVING COUNT(*) > {r.choice(['1', '2', '10'])}"
                if r.random() < 0.3
                else ""
            )
            pos = ", ".join(str(i + 1) for i in range(nkeys))
            return f"SELECT {cols} FROM {frm}{where} GROUP BY {pos}{having}"
        if kind < 6:  # plain projection (maybe DISTINCT)
            exprs = []
            for i in range(r.randrange(1, 4)):
                pick = r.randrange(3)
                if pick == 0:
                    exprs.append(f"{self.int_expr(t)} AS c{i}")
                elif pick == 1 and SCHEMA[t]["str"]:
                    exprs.append(f"{self.str_expr(t)} AS c{i}")
                else:
                    exprs.append(
                        f"(CASE WHEN {self.pred(t, 1)} THEN 1 ELSE 0 END)"
                        f" AS c{i}"
                    )
            d = "DISTINCT " if r.random() < 0.5 else ""
            return f"SELECT {d}{', '.join(exprs)} FROM {frm}{where}"
        if kind < 7:  # scalar-subquery filter (single table only)
            t = r.choice([k for k in SCHEMA if not k.startswith("__join__")])
            col = r.choice(SCHEMA[t]["int"])
            sub_agg = r.choice(["MIN", "MAX", "AVG"])
            return (
                f"SELECT COUNT(*) AS n, COALESCE(SUM(CAST({col} AS BIGINT)), 0)"
                f" AS s FROM {t} WHERE CAST({col} AS DOUBLE) >"
                f" (SELECT {sub_agg}(CAST({col} AS DOUBLE)) FROM {t})"
            )
        if kind < 8:  # set operation over one table, two filters
            t = r.choice([k for k in SCHEMA if not k.startswith("__join__")])
            col_i = r.choice(SCHEMA[t]["int"])
            col_s = (
                r.choice(SCHEMA[t]["str"]) if SCHEMA[t]["str"] else "'x'"
            )
            op = r.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
            p1, p2 = self.pred(t, 1), self.pred(t, 1)
            sel = f"SELECT {col_i} AS k, {col_s} AS v FROM {t}"
            return f"{sel} WHERE {p1} {op} {sel} WHERE {p2}"
        # window over a single table (deterministic by construction:
        # only tables with a genuinely unique order key qualify)
        t = r.choice(
            [
                k
                for k in SCHEMA
                if not k.startswith("__join__") and SCHEMA[k]["unique"]
            ]
        )
        uniq = ", ".join(SCHEMA[t]["unique"])
        gk = self.group_key(t)
        wpick = r.randrange(4)
        if wpick == 0:
            win = f"ROW_NUMBER() OVER (PARTITION BY {gk} ORDER BY {uniq})"
        elif wpick == 1:
            oc = r.choice(SCHEMA[t]["int"] + SCHEMA[t]["str"])
            fn = r.choice(["RANK()", "DENSE_RANK()"])
            win = f"{fn} OVER (PARTITION BY {gk} ORDER BY {oc})"
        elif wpick == 2:
            sc = r.choice(SCHEMA[t]["int"])
            win = (
                f"SUM(CAST({sc} AS BIGINT)) OVER (PARTITION BY {gk}"
                f" ORDER BY {uniq} ROWS BETWEEN UNBOUNDED PRECEDING"
                f" AND CURRENT ROW)"
            )
        else:
            lc = r.choice(SCHEMA[t]["int"])
            win = (
                f"{r.choice(['LAG', 'LEAD'])}({lc}, 1) OVER"
                f" (PARTITION BY {gk} ORDER BY {uniq})"
            )
        where = f" WHERE {self.pred(t)}" if r.random() < 0.6 else ""
        return (
            f"SELECT {uniq.split(', ')[0]} AS k, {gk} AS g, {win} AS w"
            f" FROM {t}{where}"
        )


# --------------------------------------------------------------------------
# Execution + comparison (the driver's canonicalization)
# --------------------------------------------------------------------------


def _norm(v):
    import decimal

    if v is None:
        return "<NULL>"
    if isinstance(v, decimal.Decimal):
        # scale-insensitive: engines derive different result scales for
        # the same exact value (Spark DECIMAL(28,2) vs DuckDB (38,2))
        if v == 0:
            return "0"
        return format(v.normalize(), "f")
    if isinstance(v, float):
        if math.isnan(v):
            return "<NULL>"
        return f"{v:.6g}"
    if hasattr(v, "isoformat"):
        if getattr(v, "tzinfo", None) is not None:
            import datetime as _dt

            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def canonicalize(rows):
    if not rows:
        return [], []
    cols = sorted(rows[0].keys())
    return cols, sorted(tuple(_norm(r[c]) for c in cols) for r in rows)


def _is_known_empty_groupingsets_divergence(sql, got, want_rows) -> bool:
    """KNOWN cross-engine divergence (FOUND BY THIS FUZZER, round 5):
    on an EMPTY input, GROUP BY ROLLUP/CUBE/GROUPING SETS including the
    () grouping set yields the grand-total super-aggregate row (count
    0) in DuckDB/Postgres/ANSI, but ZERO rows in Spark (the Expand
    operator emits nothing on empty input and the grouping-id-keyed
    aggregate has no fallback row). Classified, counted separately, and
    pinned by tests/test_fuzz_differential.py so a future Spark fix
    re-tightens the check. Recognized shape: Spark returned no rows
    and every DuckDB row has NULL in every g* group-key column."""
    if got or not want_rows:
        return False
    if "ROLLUP(" not in sql and "CUBE(" not in sql:
        return False
    for row in want_rows:
        for k, v in row.items():
            if k.startswith("g") and v is not None:
                return False
    return True


def run_fuzz(spark, duck, seed: int, n: int) -> list[dict]:
    """Generate n queries from the seed; run both engines; return the
    divergences (empty list == all match). Known engine-behavior
    divergences (see _is_known_empty_groupingsets_divergence) are
    skipped, not failed."""
    gen = Gen(seed)
    failures = []
    for i in range(n):
        stmt = gen.statement()
        if isinstance(stmt, tuple):  # dialect pair (nested family)
            s_sql, d_sql = stmt
            sql = f"spark: {s_sql}\n    duck:  {d_sql}"
        else:
            s_sql = d_sql = sql = stmt
        try:
            got_cols, got = canonicalize(
                spark.sql(s_sql).toArrow().to_pylist()
            )
        except Exception as exc:  # engine rejected/failed — report as bug
            failures.append({"i": i, "sql": sql, "err": f"spark: {exc!r:.300}"})
            continue
        try:
            want_rows = duck.execute(d_sql).arrow().to_pylist()
            want_cols, want = canonicalize(want_rows)
        except Exception as exc:
            failures.append({"i": i, "sql": sql, "err": f"duckdb: {exc!r:.300}"})
            continue
        if _is_known_empty_groupingsets_divergence(s_sql, got, want_rows):
            continue
        if (got or want) and got_cols != want_cols:
            failures.append(
                {"i": i, "sql": sql,
                 "err": f"schema: spark={got_cols} duck={want_cols}"}
            )
        elif len(got) != len(want):
            failures.append(
                {"i": i, "sql": sql,
                 "err": f"rowcount: spark={len(got)} duck={len(want)}"}
            )
        else:
            for g, w in zip(got, want):
                if g != w:
                    failures.append(
                        {"i": i, "sql": sql,
                         "err": f"values: spark={g} duck={w}"}
                    )
                    break
    return failures


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=20260816)
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--sweep", type=int, default=0, metavar="N_SEEDS",
        help="run N_SEEDS consecutive seeds (seed..seed+N-1) x --n each"
        " and write the FUZZ.json artifact (reproducible provenance for"
        " the committed sweep)",
    )
    args = ap.parse_args()

    import duckdb

    from bigdatamanagement_spark.catalog import TESTDATA_TABLES, load_testdata
    from bigdatamanagement_spark.session import get_spark

    spark = get_spark(app_name="fuzz-differential", shuffle_partitions=8)
    load_testdata(spark, args.sf_dir, register=True)
    duck = duckdb.connect()
    for name in TESTDATA_TABLES:
        path = os.path.join(args.sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            duck.execute(
                f"CREATE OR REPLACE VIEW {name} AS"
                f" SELECT * FROM read_parquet('{path}')"
            )

    if args.sweep:
        import json

        all_failures = []
        for s in range(args.seed, args.seed + args.sweep):
            fs = run_fuzz(spark, duck, s, args.n)
            all_failures += [{**f, "seed": s} for f in fs]
            print(f"seed={s}: {args.n} queries, {len(fs)} divergences", flush=True)
        artifact = {
            "sf_dir": args.sf_dir,
            "base_seed": args.seed,
            "n_per_seed": args.n,
            "seeds": args.sweep,
            "total_queries": args.sweep * args.n,
            "total_divergences": len(all_failures),
            "grammar_families": (
                "projections, null-heavy filters, FK joins, grouped aggs,"
                " HAVING, deterministic windows, set ops, scalar"
                " subqueries, EXISTS, ROLLUP/CUBE, CTEs, intervals;"
                " round 6: outer-join NULL extension, nested"
                " array/struct (dialect pairs), DECIMAL width edges;"
                " round 7: correlated LATERAL subqueries, recursive"
                " CTEs, VARIANT/parse_json (dialect pairs)"
            ),
            "known_divergences": (
                "empty-input GROUP BY ROLLUP/CUBE grand-total row: Spark"
                " emits no rows where ANSI/DuckDB emit the count-0"
                " super-aggregate row — classified + pinned"
                " (tests/test_fuzz_differential.py)"
            ),
            "divergences": all_failures[:50],
        }
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(here, "FUZZ.json"), "w") as fh:
            json.dump(artifact, fh, indent=1)
        print(
            f"sweep: {artifact['total_queries']} queries,"
            f" {len(all_failures)} divergences -> FUZZ.json"
        )
        return 1 if all_failures else 0

    failures = run_fuzz(spark, duck, args.seed, args.n)
    print(f"fuzz: seed={args.seed} n={args.n} divergences={len(failures)}")
    for f in failures:
        print(f"--- #{f['i']}: {f['err']}\n    {f['sql']}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
