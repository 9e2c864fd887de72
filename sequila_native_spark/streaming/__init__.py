"""Structured Streaming surface."""

from sequila_native_spark.streaming.events import (
    hourly_event_aggregates,
    read_event_stream,
    sessionize,
)

__all__ = ["hourly_event_aggregates", "read_event_stream", "sessionize"]
