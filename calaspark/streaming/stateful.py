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


# ------------------------------------------------------------------
# transformWithStateInPandas — the Spark 4 successor API (PGO:427):
# typed state handles (value/list/map), per-state TTL, and timers,
# where applyInPandasWithState has one untyped state tuple and a
# single timeout conf. Runtime requirements: the RocksDB state store
# provider (ROCKSDB_PROVIDER_CONF) AND the `protobuf` Python package
# (the state-server protocol is protobuf-framed; Spark's driver
# worker imports google.protobuf at query start). This container
# ships no protobuf, so the operator is execution-gated the same way
# as the multimodal codecs: code + contract are real, the test skips
# when `google.protobuf` is absent (see tws_available()).

# Import-guarded like the protobuf gate below: the typed-state API
# only exists in Spark >= 4.0, and importing this module (for the
# pre-existing applyInPandasWithState operator) must not require it.
try:
    from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
        StatefulProcessor,
        StatefulProcessorHandle,
    )
except ImportError:  # pragma: no cover — pinned runtime is 4.1.2
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = object  # type: ignore[assignment,misc]

#: RocksDB provider conf transformWithState requires (HDFS-backed
#: default store does not support the multi-state-variable layout).
ROCKSDB_PROVIDER_CONF = (
    "spark.sql.streaming.stateStore.providerClass",
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider",
)


def tws_available() -> bool:
    """True when the runtime can execute transformWithStateInPandas
    (google.protobuf importable — Spark's transform_with_state driver
    worker needs it for the state protocol)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key running (count, value-sum) accumulator — the same
    contract as :func:`running_totals_stream`, expressed through the
    typed-state API: a ValueState with an optional TTL (stale keys
    age out of the store instead of accumulating forever — the
    unbounded-key-cardinality story at 100 TB).
    """

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(
        self, key: tuple[Any, ...], rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        prev = self._totals.get() if self._totals.exists() else None
        n, s = prev if prev is not None else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            s += float(pdf["value"].sum())
        self._totals.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    def close(self) -> None:
        pass


def running_totals_tws(
    stream: DataFrame,
    key: str = "user_id",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming running totals via ``transformWithStateInPandas``.

    Same output contract as :func:`running_totals_stream`; state TTL
    (``ttl_ms``) evicts keys idle longer than the duration. The
    session must set :data:`ROCKSDB_PROVIDER_CONF` before starting
    the query. ``timeMode='processingTime'`` enables TTL and timers.
    """
    return stream.groupBy(key).transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(ttl_ms=ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="processingTime" if ttl_ms is not None else "none",
    )
