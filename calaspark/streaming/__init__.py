"""Structured Streaming surface (SURVEY.md §2.5 E23)."""

from .windows import (
    dedup_stream,
    read_stream,
    run_available_now,
    session_counts,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "dedup_stream", "read_stream", "run_available_now",
    "session_counts", "sliding_counts", "tumbling_counts",
]
