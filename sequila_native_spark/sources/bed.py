"""BED-style and interval-CSV readers.

Reference scan surface (SURVEY.md §2B):

- BED external tables: tab-delimited, no header, ``contig VARCHAR NOT NULL,
  start BIGINT NOT NULL, end BIGINT NOT NULL`` (``queries/q1-coitrees.sql:6-14``;
  FIXTURES.md F6).
- reads/targets CSV: comma-delimited with header, ``contig Utf8, pos_start
  Int32, pos_end Int64`` — the deliberately mixed widths from
  ``interval_join.rs:1688-1694`` (FIXTURES.md F1).

Plain ``spark.read.csv`` wrappers: schema declared (never inferred — an
inference pass over 100 TB is a full extra scan), pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BED3_SCHEMA = StructType(
    [
        StructField("contig", StringType(), False),
        StructField("pos_start", LongType(), False),
        StructField("pos_end", LongType(), False),
    ]
)

# optional BED columns 4-6
_BED_EXTENDED = [
    StructField("name", StringType(), True),
    StructField("score", LongType(), True),
    StructField("strand", StringType(), True),
]

INTERVAL_CSV_SCHEMA = StructType(
    [
        StructField("contig", StringType(), False),
        StructField("pos_start", IntegerType(), True),
        StructField("pos_end", LongType(), True),
    ]
)


def read_bed(spark: SparkSession, path: str, *, columns: int = 3) -> DataFrame:
    """Read a BED file (tab-separated, headerless, 3-6 columns)."""
    if not 3 <= columns <= 6:
        raise ValueError("BED supports 3-6 columns")
    schema = StructType(list(BED3_SCHEMA.fields) + _BED_EXTENDED[: columns - 3])
    return spark.read.csv(path, sep="\t", header=False, schema=schema)


def read_interval_csv(
    spark: SparkSession, path: str, *, header: bool = True
) -> DataFrame:
    """Read a reads/targets-style interval CSV (FIXTURES.md F1 schema)."""
    return spark.read.csv(path, sep=",", header=header, schema=INTERVAL_CSV_SCHEMA)


def write_bed(
    df: DataFrame,
    path: str,
    *,
    contig: str = "contig",
    start: str = "pos_start",
    end: str = "pos_end",
    extra: list[str] | None = None,
    mode: str = "error",
    single_file: bool = False,
) -> None:
    """Write intervals as BED (tab-separated, headerless, column-ordered).

    The sink twin of :func:`read_bed` — round-trips through the same schema.
    Columns are emitted in BED order (``contig, start, end, extra...``)
    regardless of the frame's layout. ``single_file=True`` coalesces to one
    part file (the bedtools-interop shape; skip it for large outputs — one
    writer task is the bottleneck, and every downstream genomics tool
    accepts a directory of parts concatenated anyway).
    """
    cols = [contig, start, end, *(extra or [])]
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"write_bed: missing columns {missing}")
    out = df.select(*cols)
    if single_file:
        out = out.coalesce(1)
    out.write.mode(mode).csv(path, sep="\t", header=False)
