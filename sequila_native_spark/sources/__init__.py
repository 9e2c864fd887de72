"""Scan/sink surface: interval file formats the reference reads."""

from sequila_native_spark.sources.bed import read_bed, read_interval_csv, write_bed

__all__ = ["read_bed", "read_interval_csv", "write_bed"]
