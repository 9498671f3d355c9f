"""Streaming EWMA drift monitor (E23 × E13): the online twin of the
batch `ops/sequential.ewma_running` signal (q142).

A 100 TB ingest pipeline wants data-quality drift flagged AT ARRIVAL
(a source whose value level jumps is quarantined before it poisons a
training mix), not in the nightly batch report. The operator keeps
one (ewma, n, n_alerts) triple per key in the state store via
``applyInPandasWithState`` — state is bounded by key cardinality,
and the shuffle key IS the state key (the same hash-partition story
as a batch groupBy).

Ordering contract (same as every sequential CDC consumer): the EWMA
recurrence is order-sensitive, so rows must arrive in ``order_col``
order — within a micro-batch the kernel sorts, across micro-batches
the source must deliver in order (a file source appended in order
with ``maxFilesPerTrigger`` does; an out-of-order source needs a
watermark+sort stage first). The fold body is the same
``α·x + (1−α)·s`` expression as the batch kernel, so a drained
bounded stream's final EWMA is BITWISE equal to
``ewma_running``'s closing value per key — the stream/batch twin
test pins it.

Alert rule (deterministic, no libm): a row alerts when the previous
smoothed level exists, is non-zero, and ``|x − s| > tau·|s|`` —
relative level jump against the smoothed baseline.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Template only — ``ewma_drift_stream`` derives the ``key`` field's
#: type from the input column (round-10 advisory: a hardcoded string
#: key forced a silent str() coercion on non-string keys, so joining
#: the output back to the source needed an unsignalled cast).
DRIFT_OUTPUT_SCHEMA = (
    "key string, n_events long, ewma double, n_alerts long"
)
DRIFT_STATE_SCHEMA = "s double, n long, n_alerts long"


def _make_drift_fn(alpha: float, tau: float, order_col: str, val_col: str):
    beta = 1.0 - alpha

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            s, n, n_alerts = state.get
            have = True
        else:
            s, n, n_alerts = 0.0, 0, 0
            have = False
        # CONCAT the group's Arrow chunks BEFORE sorting: the state
        # API hands an Iterator of DataFrames whose chunk boundaries
        # follow shuffle-fetch order, so sorting each chunk alone
        # would fold a >maxRecordsPerBatch group out of order and
        # silently corrupt the recurrence (round-10 review finding)
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.sort_values(order_col)
            for x in batch[val_col].astype(float):
                if have and s != 0.0 and abs(x - s) > tau * abs(s):
                    n_alerts += 1
                # the batch kernel's exact expression order (bitwise
                # twin contract — see module doc)
                s = x if not have else alpha * x + beta * s
                have = True
                n += 1
        state.update((s, n, n_alerts))
        yield pd.DataFrame(
            {
                # raw key value — the output schema's key field carries
                # the INPUT column's type, so no coercion happens here
                "key": [key[0]],
                "n_events": [n],
                "ewma": [s],
                "n_alerts": [n_alerts],
            }
        )

    return fn


def ewma_drift_stream(
    stream: DataFrame,
    key_col: str = "event_type",
    order_col: str = "event_id",
    val_col: str = "value",
    alpha: float = 0.125,
    tau: float = 3.0,
) -> DataFrame:
    """Per-key streaming EWMA + relative-jump alert counter.

    Output mode "update": each micro-batch emits the new running
    (n_events, ewma, n_alerts) for every key it touched. The output
    ``key`` column carries the INPUT ``key_col``'s exact type
    (string, int, …), so joining the monitor output back to the
    source on the key needs no cast.
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not (tau >= 0.0 and tau == tau and tau != float("inf")):
        raise ValueError(f"tau must be finite and >= 0, got {tau}")
    from pyspark.sql.types import LongType, StructField, StructType
    from pyspark.sql.types import DoubleType

    out_schema = StructType(
        [
            StructField("key", stream.schema[key_col].dataType),
            StructField("n_events", LongType()),
            StructField("ewma", DoubleType()),
            StructField("n_alerts", LongType()),
        ]
    )
    return stream.groupBy(key_col).applyInPandasWithState(
        _make_drift_fn(alpha, tau, order_col, val_col),
        outputStructType=out_schema,
        stateStructType=DRIFT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
