"""Plan inspection utilities (the engine's `explain/format` surface,
S-11 analog — SQLonRDS.java:280-361 rendered result tables; here we
render plan *health*).

Used by plan-regression tests to pin the physical strategies that make
queries scale: broadcast vs shuffle joins, parquet pushdown, top-k
short-circuits, window-group-limit pushdown, codegen coverage.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def plan_report(df: DataFrame) -> dict:
    """Summarize scale-relevant operators in the physical plan."""
    plan = executed_plan(df)
    return {
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "broadcast_nl_joins": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "sortmerge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "shuffled_hash_joins": len(re.findall(r"ShuffledHashJoin", plan)),
        "exchanges": len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning)", plan)),
        "take_ordered": "TakeOrderedAndProject" in plan,
        "window_group_limit": "WindowGroupLimit" in plan,
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", plan),
        "codegen_stages": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
        "python_udf": "BatchEvalPython" in plan or "ArrowEvalPython" in plan,
    }


def partitionless_windows(df: DataFrame) -> list[str]:
    """Window nodes whose spec has NO partition columns — each is a
    single-task global sort at scale (the `WindowExec: No Partition
    Defined` warning). Returns the offending plan lines so tests can
    whitelist the known tiny-grid ones (<= k-row survivor ranks) and
    fail on anything event-grain."""
    out = []
    for ln in executed_plan(df).split("\n"):
        s = ln.strip()
        if not re.search(r"\bWindow \[", s):
            continue
        for spec in re.finditer(r"windowspecdefinition\(", s):
            # split the spec's TOP-LEVEL args (partition cols first,
            # then "col ASC/DESC NULLS ..." sort specs, then the frame)
            i, depth, cur, args = spec.end(), 1, spec.end(), []
            while i < len(s) and depth:
                ch = s[i]
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        args.append(s[cur:i])
                elif ch == "," and depth == 1:
                    args.append(s[cur:i])
                    cur = i + 1
                i += 1
            first = args[0].strip() if args else ""
            if first.startswith("specifiedwindowframe") or re.search(
                r" (ASC|DESC) NULLS", first
            ):
                out.append(s[:300])
                break
    return out


def _spec_is_partitionless(s: str) -> bool:
    """True if any windowspecdefinition in the node line has NO
    partition columns (first top-level arg is a sort spec or the
    frame)."""
    for spec in re.finditer(r"windowspecdefinition\(", s):
        i, depth, cur, args = spec.end(), 1, spec.end(), []
        while i < len(s) and depth:
            ch = s[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    args.append(s[cur:i])
            elif ch == "," and depth == 1:
                args.append(s[cur:i])
                cur = i + 1
            i += 1
        first = args[0].strip() if args else ""
        if first.startswith("specifiedwindowframe") or re.search(
            r" (ASC|DESC) NULLS", first
        ):
            return True
    return False


_ROW_METRICS = ("recordsRead", "numOutputRows", "shuffleRecordsWritten")


def partitionless_window_input_rows(df: DataFrame) -> list[int]:
    """EXECUTES the query and returns, for every partition-less Window
    node in the final plan, the number of rows that flowed into it
    (from SQL metrics of the nearest row-counting descendant — the
    single-task sort size the plan gate's allowlist claims is bounded).
    -1 for a window whose input metric could not be located, so a
    caller asserting bounds fails loudly instead of skipping."""
    df.collect()  # populate SQL metrics
    plan = df._jdf.queryExecution().executedPlan()

    def unwrap(n):
        name = n.nodeName()
        if name == "AdaptiveSparkPlan":
            return unwrap(n.executedPlan())
        if name.endswith("QueryStage"):
            return unwrap(n.plan())
        return n

    def metrics(n) -> dict:
        out = {}
        it = n.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            out[kv._1()] = kv._2().value()
        return out

    def kids(n):
        out = []
        ch = n.children()
        for i in range(ch.size()):
            out.append(unwrap(ch.apply(i)))
        inner = n.innerChildren()
        for i in range(inner.size()):
            out.append(unwrap(inner.apply(i)))
        return out

    def first_rows_below(n) -> int:
        # BFS below the window for the first node carrying a row count
        frontier = kids(n)
        while frontier:
            nxt = []
            for c in frontier:
                m = metrics(c)
                for key in _ROW_METRICS:
                    if key in m:
                        return int(m[key])
                nxt.extend(kids(c))
            frontier = nxt
        return -1

    rows: list[int] = []

    def walk(n):
        n = unwrap(n)
        if n.nodeName() == "Window" and _spec_is_partitionless(
            n.simpleString(100000)
        ):
            rows.append(first_rows_below(n))
        for c in kids(n):
            walk(c)

    walk(plan)
    return rows


def filter_exprs(df: DataFrame) -> list[str]:
    """Conditions of Filter nodes in the optimized logical plan.

    Used to guard against Catalyst inferring filters (from generates or
    join-key constraints) that substitute an expensive expression pipeline
    into a per-row scan filter — see the optimizer fence in
    operators/dedup.hashed_shingle_sets."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return [ln.strip() for ln in plan.split("\n") if re.search(r"\bFilter ", ln)]


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every parquet scan — verifies column pruning."""
    return re.findall(r"ReadSchema: (struct<[^>]*>)", executed_plan(df))


def scans_are_pruned(df: DataFrame, max_cols: int) -> bool:
    """True if no scan reads more than ``max_cols`` columns."""
    for schema in read_schemas(df):
        n = schema.count(":")
        if n > max_cols:
            return False
    return True
