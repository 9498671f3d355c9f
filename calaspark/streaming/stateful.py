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
# Streaming HEAVY HITTERS (E23 x E19): Misra-Gries summaries as
# per-bucket stream state.

HH_OUTPUT_SCHEMA = "bucket int, tok string, est long"
HH_STATE_SCHEMA = "toks array<string>, counts array<long>"
HH_CAPACITY = 32


def _heavy_hitters(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-bucket mergeable Misra-Gries summary across micro-batches:
    summarize the batch with ``mg_batch`` (O(k) during the scan),
    merge into the persisted summary with ``mg_merge`` (stays <= k
    entries), emit the bucket's current candidates + estimates."""
    from ..ops.heavy import mg_batch, mg_merge

    toks, counts = state.get if state.exists else ([], [])
    summary = dict(zip(toks, counts))
    for pdf in pdfs:
        summary = mg_merge(summary, mg_batch(pdf["tok"], HH_CAPACITY), HH_CAPACITY)
    state.update((list(summary.keys()), [int(c) for c in summary.values()]))
    yield pd.DataFrame(
        {
            "bucket": [key[0]] * len(summary),
            "tok": list(summary.keys()),
            "est": [int(c) for c in summary.values()],
        }
    )


def heavy_hitters_stream(stream: DataFrame, col: str = "tok") -> DataFrame:
    """Streaming frequent-items candidates via applyInPandasWithState
    (the streaming twin of ``ops.heavy.heavy_hitters``' candidate
    pass — batch recount of the final candidate set turns the stream
    summary into EXACT answers, see the test).

    Keys hash into buckets (the grouping/state key), each bucket
    holds ONE capacity-k Misra-Gries summary — state is
    O(k x n_buckets) forever, independent of stream length or key
    cardinality. Coverage: a key with total count > N/k is heavy in
    its own bucket (count unchanged, bucket mass <= N), and the
    merged summary's error bound (n_bucket/(k+1), Agarwal et al.)
    keeps its counter positive — so the candidate union can never
    lose a global heavy hitter, micro-batching notwithstanding.
    """
    import pyspark.sql.functions as F

    bucketed = stream.select(
        F.pmod(F.xxhash64(F.col(col)), F.lit(8)).cast("int").alias("bucket"),
        F.col(col).alias("tok"),
    )
    return bucketed.groupBy("bucket").applyInPandasWithState(
        _heavy_hitters,
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
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
