"""Document-corpus readers for the LLM-pipeline layer.

JSONL (one JSON object per line) is the de-facto interchange format for
text corpora; Parquet is the at-rest format. Both readers declare their
schema up front — inference over 100 TB is a full extra scan — and
normalize to the canonical documents shape
``(doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars
BIGINT)`` used by every operator in :mod:`..functions`.

Scale notes:
- JSONL splits by line, so a directory of .jsonl(.gz per-file) files
  parallelizes naturally; schema-declared ``spark.read.json`` prunes
  unused fields at parse time (no object materialization for dropped
  keys).
- ``doc_id`` is frequently absent in raw crawls; ``id_from`` derives a
  deterministic 63-bit id by hashing a named unique field (md5-based, the
  same hash family as the sampling layer — stable across engines and
  retries, unlike ``monotonically_increasing_id`` which is
  partition-layout-dependent).

No counterpart in the reference engine (its sources are BED/CSV interval
tables — `sources/bed.py`); companion surface per SURVEY.md §6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    id_field: str | None = "doc_id",
    extra_fields: dict[str, str] | None = None,
    id_from: str | None = None,
) -> DataFrame:
    """Read a JSONL corpus into the canonical documents shape.

    - ``text_field``: the JSON key holding the document body (renamed to
      ``text``).
    - ``id_field``: key holding a numeric id; pass ``None`` when absent
      and set ``id_from`` to derive one.
    - ``id_from``: name of a unique string field (e.g. a URL) to hash
      into a deterministic 60-bit ``doc_id``. Birthday bound: expected
      collisions ≈ n²/2^61 — negligible to ~10^8 docs (<0.01), ~400 at
      10^9; corpora beyond that should carry a native id or a composite
      (source, doc_id) key.
    - ``extra_fields``: ``{json_key: output_column}`` passthroughs, read
      as strings.

    ``lang``/``source`` map from same-named keys when present in
    ``extra_fields`` values; ``n_chars`` is always recomputed from the
    text (never trusted from the file).
    """
    if id_field is None and id_from is None:
        raise ValueError("one of id_field / id_from is required")
    fields = [StructField(text_field, StringType(), True)]
    if id_field:
        fields.append(StructField(id_field, LongType(), True))
    if id_from and id_from != text_field:
        fields.append(StructField(id_from, StringType(), True))
    for key in extra_fields or {}:
        if key not in {f.name for f in fields}:
            fields.append(StructField(key, StringType(), True))
    raw = spark.read.schema(StructType(fields)).json(path)

    if id_field:
        doc_id = F.col(id_field).cast("long")
    else:
        # deterministic 63-bit id from the unique field (md5 low bits, the
        # sampling layer's hash family) — stable across partitioning/retries
        doc_id = (
            F.conv(F.substring(F.md5(F.col(id_from)), 1, 15), 16, 10)
            .cast("bigint")
        )
    cols = [
        doc_id.alias("doc_id"),
        F.col(text_field).alias("text"),
        F.length(F.col(text_field)).cast("long").alias("n_chars"),
    ]
    for key, out in (extra_fields or {}).items():
        cols.append(F.col(key).alias(out))
    return raw.select(*cols)


def read_documents_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Canonical documents parquet (the driver testdata shape) — declared
    schema so drift in the file fails loudly instead of silently changing
    downstream types."""
    return spark.read.schema(DOCUMENTS_SCHEMA).parquet(path)
