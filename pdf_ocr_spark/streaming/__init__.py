"""Structured Streaming surface for the extraction engine."""

from .jobs import (
    conversation_state_stats, stream_dedup_exact, stream_dedup_neardup,
    stream_extraction, stream_method_counts, stream_sessionize,
)

__all__ = ["conversation_state_stats", "stream_dedup_exact",
           "stream_dedup_neardup", "stream_extraction",
           "stream_method_counts", "stream_sessionize"]
