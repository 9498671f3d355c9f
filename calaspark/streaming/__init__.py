"""Structured Streaming surface (SURVEY.md §2.5 E23)."""

from .stateful import running_totals_stream

from .windows import (
    dedup_stream,
    read_stream,
    run_available_now,
    session_counts,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "running_totals_stream",
    "dedup_stream", "read_stream", "run_available_now",
    "session_counts", "sliding_counts", "tumbling_counts",
]
