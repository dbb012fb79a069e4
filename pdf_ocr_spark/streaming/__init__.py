"""Structured Streaming surface for the extraction engine."""

from .jobs import stream_extraction, stream_method_counts

__all__ = ["stream_extraction", "stream_method_counts"]
