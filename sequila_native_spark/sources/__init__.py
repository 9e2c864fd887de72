"""Scan/sink surface: interval file formats the reference reads."""

from sequila_native_spark.sources.bed import read_bed, read_interval_csv, write_bed
from sequila_native_spark.sources.events import normalize_event_ts, read_events

__all__ = [
    "normalize_event_ts",
    "read_bed",
    "read_events",
    "read_interval_csv",
    "write_bed",
]
