"""Structured Streaming surface: validate a transcript stream with the
same compiled rule set used in batch."""

from cerberus_spark.streaming.validate_stream import (
    validate_stream,
    streaming_dedup,
    streaming_drift_monitor,
    run_stream_to_memory,
)

__all__ = [
    "validate_stream",
    "streaming_dedup",
    "streaming_drift_monitor",
    "run_stream_to_memory",
]
