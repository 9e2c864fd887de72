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
