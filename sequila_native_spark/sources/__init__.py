"""Scan/sink surface: interval file formats the reference reads, plus the
JSONL/parquet document-corpus readers of the LLM-pipeline layer."""

from sequila_native_spark.sources.bed import read_bed, read_interval_csv, write_bed
from sequila_native_spark.sources.documents import (
    DOCUMENTS_SCHEMA,
    read_documents_jsonl,
    read_documents_parquet,
)
from sequila_native_spark.sources.events import normalize_event_ts, read_events

__all__ = [
    "DOCUMENTS_SCHEMA",
    "normalize_event_ts",
    "read_bed",
    "read_documents_jsonl",
    "read_documents_parquet",
    "read_events",
    "read_interval_csv",
    "write_bed",
]
