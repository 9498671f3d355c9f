"""Custom stateful streaming operators (SURVEY.md §2.5 E23
"arbitrary state": `applyInPandasWithState` PGO:306).

When watermarked windows/dedup can't express the semantics (running
per-key accumulators, custom eviction, cross-batch logic), the escape
hatch is a user state machine over grouped Arrow batches. State lives
in the state store partitioned by the grouping key — the shuffle key
IS the state key, so scaling is the same hash-partition story as a
batch groupBy.

The demo operator is a per-key running event counter with a
cumulative value sum — the canonical CDC-style accumulator. Python
here is legitimate (the state machine is user logic); rows cross in
Arrow batches, not row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double"
STATE_SCHEMA = "n long, s double"


def _running_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, value-sum) per key across micro-batches."""
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
    )


def running_totals_stream(stream: DataFrame, key: str = "user_id") -> DataFrame:
    """Streaming per-key running totals via applyInPandasWithState.

    Output mode "update": each micro-batch emits the new running
    total for every key it touched. State is one (long, double) pair
    per key — bounded by key cardinality, not stream length.
    """
    return stream.groupBy(key).applyInPandasWithState(
        _running_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
