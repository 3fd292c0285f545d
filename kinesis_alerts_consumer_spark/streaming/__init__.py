"""Structured Streaming layer: stream wiring for the record pipeline,
windowed aggregations, and foreachBatch sinks with retry + DLQ."""

from .pipeline import replay_lines, stream_lines
from .sinks import MetricsSink, RetryPolicy

__all__ = ["replay_lines", "stream_lines", "MetricsSink", "RetryPolicy"]
