"""Structured Streaming surface."""

from sequila_native_spark.streaming.events import (
    correlate_event_streams,
    dedup_events,
    hourly_event_aggregates,
    read_event_stream,
    sessionize,
)
from sequila_native_spark.streaming.stateful import running_user_totals

__all__ = [
    "correlate_event_streams",
    "dedup_events",
    "hourly_event_aggregates",
    "read_event_stream",
    "running_user_totals",
    "sessionize",
]
