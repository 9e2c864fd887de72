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
    _check(size, overlap)
    reserved = {"chunk_id", "n_tokens", "chunk_text", "_pos", "s", "_t"}
    if id_col in reserved:
        raise ValueError(
            f"id_col {id_col!r} collides with a chunk output/helper column "
            f"({sorted(reserved)}); rename it first"
        )
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


def pack_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    capacity: int = 2048,
    shards: int = 32,
    seed: int = 0,
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Sequence packing (concat-and-cut): lay the corpus out as one token
    stream and cut it every ``capacity`` tokens — the standard prep step
    for training on fixed context windows. Per document:

    ``(id_col, shard, n_tokens, start_tok, first_pack, last_pack,
    pack_offset)`` where ``start_tok`` is the document's offset in its
    shard's token stream, ``first_pack``/``last_pack`` the pack indices it
    lands in (a document straddles packs when ``first_pack < last_pack``)
    and ``pack_offset`` its position inside ``first_pack``.

    Document order is the deterministic md5 hash order of
    :func:`~sequila_native_spark.functions.sampling.sample_hash` — the
    reproducible global shuffle a training pipeline needs (retry- and
    partitioning-stable, unlike ``df.orderBy(rand())``).

    100 TB design: a single global cumulative sum would serialize on one
    partition, so the stream is sharded by hash into ``shards`` independent
    token streams (pack ids are per-shard); each shard's window sort runs
    on its own partition and shards scale with the cluster. One shuffle
    (the window partitionBy), pure Catalyst."""
    from pyspark.sql import Window

    from .sampling import sample_hash

    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    if shards <= 0:
        raise ValueError(f"shards must be positive, got {shards}")
    reserved = {"shard", "n_tokens", "start_tok", "first_pack", "last_pack",
                "pack_offset", "_h"}
    if id_col in reserved:
        raise ValueError(
            f"id_col {id_col!r} collides with a pack output/helper column "
            f"({sorted(reserved)}); rename it first"
        )
    h = sample_hash(F.col(id_col), seed)
    # n_tokens_col: use a precomputed token count (e.g. bpe_token_count —
    # subword counts are what context-window capacity is measured in)
    # instead of the whitespace default
    if n_tokens_col is not None:
        if n_tokens_col not in df.columns:
            raise ValueError(
                f"n_tokens_col {n_tokens_col!r} not found in {df.columns}"
            )
        # NULL counts would silently propagate NULL cumsums/pack ids for
        # every later row in the shard — fail fast instead (advisor, r6)
        n_tok = (
            F.when(
                F.col(n_tokens_col).isNull(),
                F.raise_error(F.lit(
                    f"pack_documents: NULL in n_tokens_col "
                    f"{n_tokens_col!r}; filter or impute counts first"
                )),
            )
            .otherwise(F.col(n_tokens_col))
            .cast("long")
        )
    else:
        n_tok = F.size(F.split(F.col(text_col), " ")).cast("long")
    base = df.select(
        F.col(id_col),
        (h % shards).alias("shard"),
        h.alias("_h"),
        n_tok.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        (cum - F.col("n_tokens")).alias("start_tok"),
        F.floor((cum - F.col("n_tokens")) / capacity).cast("bigint").alias("first_pack"),
        F.floor((cum - 1) / capacity).cast("bigint").alias("last_pack"),
        ((cum - F.col("n_tokens")) % capacity).alias("pack_offset"),
    )


def pack_documents_sql(
    rel: str,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    capacity: int = 2048,
    shards: int = 32,
    seed: int = 0,
) -> str:
    """DuckDB twin of :func:`pack_documents` (bit-identical md5 order via
    ``sample_hash_sql``; the window ORDER BY ``(hash, id)`` is total for
    unique ids, so the cumulative sums agree exactly)."""
    from .sampling import sample_hash_sql

    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    if shards <= 0:
        raise ValueError(f"shards must be positive, got {shards}")
    h = sample_hash_sql(id_expr, seed)
    return f"""
        WITH base AS (
            SELECT {id_expr} AS doc_id,
                   {h} % {shards} AS shard,
                   {h} AS _h,
                   len(string_split({text_expr}, ' ')) AS n_tokens
            FROM {rel}
        ),
        c AS (
            SELECT doc_id, shard, n_tokens,
                   sum(n_tokens) OVER (
                       PARTITION BY shard ORDER BY _h, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum
            FROM base
        )
        SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(cum - n_tokens AS BIGINT) AS start_tok,
               CAST((cum - n_tokens) // {capacity} AS BIGINT) AS first_pack,
               CAST((cum - 1) // {capacity} AS BIGINT) AS last_pack,
               CAST((cum - n_tokens) % {capacity} AS BIGINT) AS pack_offset
        FROM c
    """


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    shards: int = 32,
    seed: int = 0,
    mode: str = "error",
) -> None:
    """Materialize the corpus in TRAINING order: ``shards`` parquet
    directories (``shard=<i>/``), each holding its rows in the
    deterministic md5 hash order of :func:`pack_documents` — the
    reproducible global shuffle a training run reads sequentially.

    Why not ``df.orderBy(rand()).write``: per-partition RNG is neither
    retry- nor repartition-stable, and a single global sort serializes the
    write. Here shard assignment and within-shard order derive from
    ``sample_hash(id, seed)`` alone, so a re-run, a task retry, or a
    different upstream partitioning produces identical shard contents
    (row sets AND row order), and each shard sorts independently (``repartition(shard)``
    + ``sortWithinPartitions`` — one shuffle, no global sort barrier).

    The layout agrees with :func:`pack_documents` (same hash, same shard
    arithmetic), so a pack manifest computed separately lines up with the
    written files row-for-row.
    """
    from .sampling import sample_hash

    if shards <= 0:
        raise ValueError(f"shards must be positive, got {shards}")
    # the writer persists the FULL frame, so clobbering an existing column
    # would be silent data loss in the written shards
    taken = {"shard", "__sq_h"} & set(df.columns)
    if id_col in ("shard", "__sq_h") or taken:
        raise ValueError(
            f"column(s) {sorted(taken) or [id_col]} collide with the "
            f"writer's shard/helper columns; rename them first"
        )
    h = sample_hash(F.col(id_col), seed)
    (
        df.withColumn("__sq_h", h)
        .withColumn("shard", (F.col("__sq_h") % shards).cast("int"))
        # repartition ON the shard value: rows of one shard land in one
        # task, so sortWithinPartitions IS the shard's total order (ties
        # on the hash break by id; ids are assumed unique)
        .repartition(shards, F.col("shard"))
        .sortWithinPartitions("shard", "__sq_h", id_col)
        .drop("__sq_h")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )
