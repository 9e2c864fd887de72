"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a media-type string; the
Spark-side plumbing (schema, Arrow batch shape, partitioning, UDF
signatures) is real and tested. The actual codec step is STUBBED: the
image/audio libraries are not in this container, so ``decode_media_meta``
computes deterministic metadata from the raw bytes, and the codec hook
raises ``NotImplementedError`` unless a decoder is importable.

At scale: payload columns dominate partition size — callers should set
``spark.sql.files.maxPartitionBytes`` down and rely on
``spark.sql.execution.arrow.maxRecordsPerBatch`` to bound UDF batch memory
(the analogue of the reference's bounded-output-batch machinery,
``interval_join.rs:550-555``).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def attach_binary(
    df: DataFrame, source_col: str = "text", *, media_type: str = "text/plain"
) -> DataFrame:
    """Materialize an opaque payload column (here: utf-8 bytes of a text
    column — the deterministic stand-in for real image/audio blobs)."""
    return df.withColumn("payload", F.encode(F.col(source_col), "utf-8")).withColumn(
        "media_type", F.lit(media_type)
    )


def _try_decoder(media_type: str):
    """Return a real decoder callable if its library exists, else None."""
    if media_type.startswith("image/"):
        try:  # not present in this container — plumbing only
            from PIL import Image  # noqa: F401

            return lambda raw: Image.open(raw)
        except ImportError:
            return None
    return None


def decode_media_meta(
    df: DataFrame,
    payload_col: str = "payload",
    *,
    strict_decode: bool = False,
) -> DataFrame:
    """Per-payload metadata via Arrow-batched ``mapInPandas``.

    Deterministic fields computable from raw bytes: ``n_bytes`` and
    ``header_hex`` (first 4 bytes, uppercase hex — matching SQL ``hex()``).
    With ``strict_decode=True`` a real codec is required and its absence
    raises ``NotImplementedError`` (the documented stub boundary).
    """
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("n_bytes", LongType(), False),
            StructField("header_hex", StringType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict_decode and _try_decoder("image/any") is None:
            raise NotImplementedError(
                "no media decoder available in this environment; "
                "install a codec or call with strict_decode=False"
            )
        for pdf in batches:
            if pdf.empty:
                continue
            pdf = pdf.copy()
            payloads = pdf[payload_col]
            pdf["n_bytes"] = payloads.map(len).astype("int64")
            pdf["header_hex"] = payloads.map(lambda b: bytes(b[:4]).hex().upper())
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def sample_chunks(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    *,
    n_chunks: int = 4,
) -> DataFrame:
    """Frame-sampling plumbing: split each payload into ``n_chunks`` evenly
    spaced byte chunks, one output row per chunk (the batch/explode shape a
    real video frame-sampler would have).

    Output: ``id, chunk_idx, chunk_bytes, chunk`` — deterministic fake
    "frames" until a real codec is wired into the stub boundary above.
    """
    out_schema = StructType(
        [
            df.schema[id_col],
            StructField("chunk_idx", LongType(), False),
            StructField("chunk_bytes", LongType(), False),
            StructField("chunk", BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = {"id": [], "idx": [], "nb": [], "chunk": []}
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                step = max(len(raw) // n_chunks, 1)
                for i in range(n_chunks):
                    piece = raw[i * step : (i + 1) * step]
                    if not piece:
                        break
                    rows["id"].append(rid)
                    rows["idx"].append(i)
                    rows["nb"].append(len(piece))
                    rows["chunk"].append(piece)
            yield pd.DataFrame(
                {
                    id_col: rows["id"],
                    "chunk_idx": pd.Series(rows["idx"], dtype="int64"),
                    "chunk_bytes": pd.Series(rows["nb"], dtype="int64"),
                    "chunk": rows["chunk"],
                }
            )

    return df.mapInPandas(run, schema=out_schema)
