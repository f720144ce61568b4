"""Custom stateful streaming operator via applyInPandasWithState — the
engine's template for state Spark's built-in windows can't express
(running per-key accumulators, custom eviction, cross-batch logic).

State is one (total, n) pair per user — bounded by key cardinality, not
stream length. The Arrow batch iterator keeps the Python crossing
amortized (one call per key per micro-batch).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, total_value double, n_events bigint"
STATE_SCHEMA = "total double, n bigint"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Running (total value, event count) per user, emitted every batch."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        total, n = state.get if state.exists else (0.0, 0)
        for pdf in pdfs:
            total += float(pdf["value"].sum())
            n += len(pdf)
        state.update((total, n))
        yield pd.DataFrame(
            {"user_id": [key[0]], "total_value": [total], "n_events": [n]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
