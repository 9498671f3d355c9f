"""Structured Streaming surface (SURVEY.md §2.5 E23)."""

from .drift import ewma_drift_stream

from .stateful import (
    ROCKSDB_PROVIDER_CONF,
    heavy_hitters_stream,
    running_totals_stream,
    running_totals_tws,
    tws_available,
)

from .sinks import foreach_batch_upsert, merge_upsert, read_upsert_table

from .windows import (
    dedup_stream,
    drain_snapshot,
    interval_join_stream,
    read_stream,
    release_stream_state,
    run_available_now,
    session_counts,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "ROCKSDB_PROVIDER_CONF",
    "ewma_drift_stream",
    "heavy_hitters_stream",
    "running_totals_stream",
    "running_totals_tws",
    "tws_available",
    "foreach_batch_upsert", "merge_upsert", "read_upsert_table",
    "dedup_stream", "drain_snapshot", "interval_join_stream",
    "read_stream", "release_stream_state", "run_available_now",
    "session_counts", "sliding_counts", "tumbling_counts",
]
