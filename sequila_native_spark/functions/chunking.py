"""Fixed-window document chunking for context-window preparation.

Splits each document into token windows of ``size`` tokens with ``overlap``
tokens of overlap (stride = ``size - overlap``) — the standard shape for
packing long documents into model context windows. Pure Catalyst
(``sequence`` + ``slice`` + ``array_join`` higher-order expressions, zero
Python), with a DuckDB ANSI-SQL twin for oracle comparison.

Chunk-count convention (the usual one): ``1 + ceil(max(len - size, 0) /
stride)`` chunks, so the final chunk ends at the document end and no chunk
is fully contained in its predecessor. A document with ``len <= size``
yields exactly one chunk; an empty/whitespace document yields one empty
chunk (callers filter on ``n_tokens > 0`` if they want them gone).

100 TB design: chunk generation is in-scan and embarrassingly parallel —
no shuffle, no UDF; the explode multiplies rows by ~len/stride but never
materializes a document twice. Token arrays stay inside whole-stage
codegen.

Reference context: no counterpart in the reference engine; companion
LLM-data-pipeline layer (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _check(size: int, overlap: int) -> int:
    if size <= 0:
        raise ValueError(f"chunk size must be positive, got {size}")
    if not 0 <= overlap < size:
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < size, got overlap={overlap} "
            f"size={size}"
        )
    return size - overlap


def chunk_starts(toks: Column, size: int, overlap: int) -> Column:
    """0-based start offsets of each chunk window over a token array."""
    stride = _check(size, overlap)
    extra = F.greatest(F.size(toks) - size, F.lit(0))
    # integer ceil(extra / stride): (extra + stride - 1) - mod, then / stride
    last = ((extra + stride - 1) - (extra + stride - 1) % stride)
    return F.sequence(F.lit(0), last, F.lit(stride))


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Explode each document into ``(id_col, chunk_id, n_tokens,
    chunk_text)`` rows. ``chunk_id`` is the 0-based window index;
    ``n_tokens`` counts the (possibly shorter) final window. Tokens are
    whitespace words, original case (chunking must not alter content)."""
    stride = _check(size, overlap)
    toks = F.split(F.col(text_col), " ")
    starts = chunk_starts(toks, size, overlap)
    exploded = df.select(
        F.col(id_col), F.posexplode(starts).alias("_pos", "s"), toks.alias("_t")
    )
    return exploded.select(
        id_col,
        F.col("_pos").alias("chunk_id"),
        F.size(F.slice(F.col("_t"), (F.col("s") + 1).cast("int"), size)).alias(
            "n_tokens"
        ),
        F.array_join(
            F.slice(F.col("_t"), (F.col("s") + 1).cast("int"), size), " "
        ).alias("chunk_text"),
    )


def chunk_documents_sql(
    rel: str,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    size: int = 64,
    overlap: int = 8,
) -> str:
    """DuckDB twin of :func:`chunk_documents` (1-based list slicing;
    ``range`` handles the start offsets, integer ``//`` the ceil)."""
    stride = _check(size, overlap)
    toks = f"string_split({text_expr}, ' ')"
    return f"""
        WITH base AS (
            SELECT {id_expr} AS doc_id, {toks} AS t,
                   greatest(len({toks}) - {size}, 0) AS extra
            FROM {rel}
        ),
        st AS (
            SELECT doc_id, t,
                   unnest(range(0, ((extra + {stride} - 1) // {stride}) * {stride} + 1, {stride})) AS s
            FROM base
        )
        SELECT doc_id, s // {stride} AS chunk_id,
               len(t[s + 1 : s + {size}]) AS n_tokens,
               array_to_string(t[s + 1 : s + {size}], ' ') AS chunk_text
        FROM st
    """
