"""Exact-substring duplication statistics (the ExactSubstr family of
Lee et al. 2021, "Deduplicating Training Data Makes Language Models
Better", arXiv:2107.06499) — the third dedup axis next to lexical
(MinHash/SimHash/containment) and semantic (SemDeDup).

ExactSubstr marks spans of text that occur verbatim elsewhere in the
corpus. The paper builds a single-node suffix array; the distributed
formulation used here (and by the large-scale reproductions) is n-token
granularity: an n-gram INSTANCE is duplicated iff its gram occurs ≥2 times
corpus-wide, and a token is duplicated iff some duplicated gram covers it.

Plan shape, by stage:

- **Positioned grams** (:func:`positioned_shingles`): per-row Catalyst HOF
  (``transform`` over a ``sequence`` of start offsets) + ``posexplode`` —
  in-scan, no Python, no shuffle.
- **Gram keys**: grams travel as 60-bit md5-derived integers (the house
  JSONL derived-id construction — bit-identical in DuckDB, so the whole
  operator is hash-oracle material). Collision odds are birthday-bounded:
  ~10¹² distinct grams (a 100 TB corpus) in a 2⁶⁰ space ⇒ ~0.04% of grams
  suffer ANY collision, and a collision only ever over-marks a span as
  duplicated.
- **Corpus counts**: one map-side-combinable ``groupBy(key)`` — the only
  corpus-wide shuffle, carrying (key, count) pairs, not text.
- **Join-back**: duplicated keys ⨝ positioned instances is 1:1 per
  instance (keys are distinct on the build side — no fan-out, no skew
  blow-up; hot stop-grams cost their instance count, which they already
  paid in the explode).
- **Span coverage**: per-doc ``aggregate`` HOF over the sorted duplicated
  start positions — intervals are fixed-length ``n`` so the running union
  is a two-field fold (covered, last_end), state bounded by the doc.

Output is exact integers end to end; a removal pass (the paper deletes the
duplicated spans) is ``filter(tokens, (tok, i) -> NOT covered(i))`` over
the same positions — left to the caller, since removal policy (delete vs
document-drop vs mask) is pipeline-specific.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sequila_native_spark.functions.text import tokens
from sequila_native_spark.util import ensure_parallel


def positioned_shingles(col: Column, n: int = 8) -> Column:
    """All word n-grams of a text column IN ORDER (not distinct — position
    matters here, unlike :func:`dedup.shingles`). Documents shorter than
    ``n`` tokens yield an empty array."""
    toks = tokens(col)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def _gram_key(gram: Column) -> Column:
    """60-bit md5-derived integer gram key — DuckDB twin:
    ``CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT)``."""
    return F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("bigint")


def _positioned_gram_keys(col: Column, n: int) -> Column:
    """``array<long>`` of ``_gram_key(positioned_shingles(col, n))`` in
    order — one Arrow pass (r12, guide §4.2).

    Catalyst evaluated the gram ``transform`` interpreted (n ``element_at``
    + ``concat_ws`` per gram, no codegen) and then shipped every ~50-byte
    gram string into the explode just to md5 it. Tokenize + n-gram join +
    md5 + hex-prefix int here run at C speed and only the int64 keys leave
    the pass. Bit-identical to the expression chain (same UTF-8 md5, same
    15-hex-char prefix; ``str.lower()``/single-space split parity with the
    SQL twins is the house :func:`~sequila_native_spark.functions.dedup.
    shingles_fast` contract, pinned in tests)."""
    from pyspark.sql.types import ArrayType, LongType

    @F.pandas_udf(ArrayType(LongType()))
    def keys(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None or (isinstance(t, float) and pd.isna(t)):
                out.append([])
                continue
            toks = t.lower().split(" ")
            if len(toks) < n:
                out.append([])
                continue
            out.append([
                int(
                    hashlib.md5(
                        " ".join(toks[i : i + n]).encode()
                    ).hexdigest()[:15],
                    16,
                )
                for i in range(len(toks) - n + 1)
            ])
        return pd.Series(out)

    return keys(col)


def duplicated_span_starts(
    docs: DataFrame,
    *,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
) -> DataFrame:
    """Per-document sorted start positions of duplicated n-gram instances:
    ``(id_col, __sq_starts: array<int>)``, one row per document with ≥1
    duplicated instance. This is the subtree BOTH
    :func:`duplicated_span_stats` and :func:`remove_duplicate_spans`
    fold over — callers that need both (e.g. a stats+removal conservation
    check) can compute it once, ``localCheckpoint`` it, and pass it to
    each via their ``starts=`` parameter instead of paying the positioned-
    gram explode and corpus-count shuffle twice (r12, guide §2.4)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    src = ensure_parallel(docs.select(id_col, text_col))
    positioned = src.select(
        F.col(id_col),
        F.posexplode(_positioned_gram_keys(F.col(text_col), n)).alias(
            "__pos", "__key"
        ),
    )
    dup_keys = (
        positioned.groupBy("__key")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .where(F.col("__cnt") >= min_count)
        .select("__key")
    )
    return (
        positioned.join(dup_keys, "__key")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("__pos")).alias("__sq_starts"))
    )


def _coverage_fold(starts_arr: Column, n: int) -> Column:
    """Tokens covered by the union of fixed-length spans ``[p, p+n)`` over a
    SORTED start array — the running two-field fold from the module
    docstring (covered, last_end)."""
    return F.aggregate(
        starts_arr,
        F.struct(
            F.lit(0).cast("bigint").alias("cov"),
            F.lit(-1).cast("bigint").alias("end"),
        ),
        lambda acc, p: F.struct(
            (
                acc["cov"] + p.cast("bigint") + F.lit(n)
                - F.greatest(acc["end"], p.cast("bigint"))
            ).alias("cov"),
            (p.cast("bigint") + F.lit(n)).alias("end"),
        ),
        lambda acc: acc["cov"],
    )


def duplicated_span_stats(
    docs: DataFrame,
    *,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    starts: DataFrame | None = None,
) -> DataFrame:
    """Per-document exact-substring duplication statistics at n-token
    granularity: ``(id, n_tokens, n_grams, n_dup_grams, dup_tokens)``.

    - ``n_grams``: n-gram instances in the doc (``max(n_tokens - n + 1, 0)``)
    - ``n_dup_grams``: instances whose gram occurs ≥ ``min_count`` times
      corpus-wide (within-doc repeats count, as in the paper)
    - ``dup_tokens``: tokens covered by ≥1 duplicated gram — the union of
      the fixed-length spans, an exact integer

    Every input document appears in the output (zero stats for clean or
    too-short docs). ``dup_tokens / n_tokens`` is the paper's duplicated
    fraction; thresholding it is the dedup filter.

    ``starts``: a precomputed :func:`duplicated_span_starts` frame at the
    SAME ``(n, text_col, id_col, min_count)`` — per-doc n_dup_grams is its
    array size and dup_tokens the same coverage fold, so the values are
    bit-identical while the explode+count shuffle is shared with other
    consumers instead of recomputed.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    if starts is not None:
        per_doc = starts.select(
            F.col(id_col),
            F.size("__sq_starts").cast("bigint").alias("n_dup_grams"),
            _coverage_fold(F.col("__sq_starts"), n).alias("dup_tokens"),
        )
    else:
        src = ensure_parallel(docs.select(id_col, text_col))
        positioned = src.select(
            F.col(id_col),
            F.posexplode(_positioned_gram_keys(F.col(text_col), n)).alias(
                "__pos", "__key"
            ),
        )

        dup_keys = (
            positioned.groupBy("__key")
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .where(F.col("__cnt") >= min_count)
            .select("__key")
        )

        per_doc = (
            positioned.join(dup_keys, "__key")
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_dup_grams"),
                _coverage_fold(
                    F.sort_array(F.collect_list("__pos")), n
                ).alias("dup_tokens"),
            )
        )
    toks = tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
        .cast("bigint")
        .alias("n_grams"),
    )
    return base.join(per_doc, id_col, "left").select(
        id_col,
        "n_tokens",
        "n_grams",
        F.coalesce("n_dup_grams", F.lit(0)).cast("bigint").alias("n_dup_grams"),
        F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias("dup_tokens"),
    )


def duplicated_span_stats_sql(
    table: str = "documents",
    *,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
) -> str:
    """DuckDB twin of :func:`duplicated_span_stats` — same md5 gram keys,
    same coverage fold (window form; ``pos`` is unique per doc so the
    ORDER BY is total)."""
    toks = f"string_split(lower({text_col}), ' ')"
    gram = f"array_to_string(t[i:i + {n - 1}], ' ')"
    return f"""
        WITH toks AS (
            SELECT {id_col}, {toks} AS t FROM {table}
        ),
        pg AS (
            -- unnest-in-select (not a lateral range join, which DuckDB's
            -- range table function does not support for column parameters)
            SELECT {id_col}, i - 1 AS pos,
                   CAST(concat('0x', substr(md5({gram}), 1, 15)) AS BIGINT) AS key
            FROM (
                SELECT {id_col}, t, unnest(range(1, len(t) - {n} + 2)) AS i
                FROM toks
            )
        ),
        dup AS (
            SELECT key FROM pg GROUP BY key HAVING count(*) >= {min_count}
        ),
        marked AS (
            SELECT {id_col}, pos,
                   pos + {n} - greatest(
                       coalesce(max(pos + {n}) OVER (
                           PARTITION BY {id_col} ORDER BY pos
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), -1), pos) AS newly
            FROM pg JOIN dup USING (key)
        ),
        per_doc AS (
            SELECT {id_col}, count(*) AS n_dup_grams, sum(newly) AS dup_tokens
            FROM marked GROUP BY {id_col}
        )
        SELECT d.{id_col},
               CAST(len({toks}) AS BIGINT) AS n_tokens,
               CAST(greatest(len({toks}) - {n - 1}, 0) AS BIGINT) AS n_grams,
               CAST(coalesce(p.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
               CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens
        FROM {table} d LEFT JOIN per_doc p USING ({id_col})
    """


def remove_duplicate_spans(
    docs: DataFrame,
    *,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    kept_col: str = "kept_text",
    starts: DataFrame | None = None,
) -> DataFrame:
    """The paper's REMOVAL pass (Lee et al. 2021 §4.2): delete every token
    covered by a duplicated n-gram and keep the rest, preserving order.
    Appends to each input row:

    - ``kept_col``: the surviving tokens joined by single spaces (token-
      normalized — lowercased/whitespace-split like every operator in this
      family; NULL text stays NULL),
    - ``n_tokens`` / ``n_kept_tokens``: exact integers with the invariant
      ``n_kept_tokens == n_tokens - dup_tokens`` against
      :func:`duplicated_span_stats` at the same ``(n, min_count)`` — the
      removal's correctness chain to the hash-checked stats oracle.

    Plan shape: the stats operator's positioned-gram count (one map-side-
    combinable shuffle) feeds a per-doc sorted duplicated-start array; two
    Catalyst ``aggregate`` HOFs then (a) merge the fixed-length spans and
    (b) splice the kept token ranges between merged spans — O(spans +
    tokens) per doc, pure JVM, no Python, no extra shuffle beyond the
    stats plan's own. Removal policy alternatives (drop the whole doc,
    mask) are one expression on the same columns.

    ``starts``: a precomputed :func:`duplicated_span_starts` frame at the
    SAME ``(n, text_col, id_col, min_count)``, to share that subtree with
    other consumers (bit-identical output either way).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    taken = {kept_col, "n_tokens", "n_kept_tokens", "__sq_starts"} & set(docs.columns)
    if taken:
        raise ValueError(
            f"column(s) {sorted(taken)} collide with removal outputs; "
            f"rename them first"
        )
    if starts is None:
        starts = duplicated_span_starts(
            docs,
            n=n,
            text_col=text_col,
            id_col=id_col,
            min_count=min_count,
        )
    out = docs.join(starts, id_col, "left")
    toks = tokens(F.col(text_col))

    # merge the sorted fixed-length spans [p, p+n): extend the last span
    # while it still reaches the next start, else open a new one
    empty_spans = F.array().cast("array<struct<s:bigint,e:bigint>>")

    def merge_step(acc, p):
        pl = p.cast("bigint")
        last = F.element_at(acc, -1)
        extend = F.concat(
            F.slice(acc, 1, F.size(acc) - 1),
            F.array(F.struct(last["s"].alias("s"), (pl + n).alias("e"))),
        )
        append = F.concat(
            acc, F.array(F.struct(pl.alias("s"), (pl + n).alias("e")))
        )
        return F.when(
            (F.size(acc) > 0) & (last["e"] >= pl), extend
        ).otherwise(append)

    spans = F.aggregate(
        F.coalesce(F.col("__sq_starts"), F.array().cast("array<int>")),
        empty_spans,
        merge_step,
    )

    # splice: for each merged span emit the tokens since the previous
    # span's end, then the tail after the last span (1-based slice)
    init = F.struct(
        F.lit(0).cast("bigint").alias("prev"),
        F.array().cast("array<string>").alias("parts"),
    )

    def splice_step(acc, sp):
        return F.struct(
            sp["e"].alias("prev"),
            F.concat(
                acc["parts"],
                F.slice(
                    toks,
                    (acc["prev"] + 1).cast("int"),
                    (sp["s"] - acc["prev"]).cast("int"),
                ),
            ).alias("parts"),
        )

    kept_arr = F.aggregate(
        spans,
        init,
        splice_step,
        lambda acc: F.concat(
            acc["parts"],
            F.slice(
                toks,
                (acc["prev"] + 1).cast("int"),
                (F.size(toks) - acc["prev"]).cast("int"),
            ),
        ),
    )
    null_text = F.col(text_col).isNull()
    return out.select(
        *[F.col(c) for c in docs.columns],
        F.when(null_text, F.lit(None).cast("string"))
        .otherwise(F.concat_ws(" ", kept_arr)).alias(kept_col),
        F.when(null_text, F.lit(None).cast("bigint"))
        .otherwise(F.size(toks).cast("bigint")).alias("n_tokens"),
        F.when(null_text, F.lit(None).cast("bigint"))
        .otherwise(F.size(kept_arr).cast("bigint")).alias("n_kept_tokens"),
    )


def remove_duplicate_spans_py(
    texts: list[tuple[int, str | None]], n: int = 8, min_count: int = 2
) -> dict[int, str | None]:
    """Independent reference implementation for tests (not a Spark path)."""
    import hashlib
    from collections import Counter

    toks = {
        i: (t.lower().split(" ") if t is not None else None) for i, t in texts
    }
    cnt: Counter = Counter()
    for tk in toks.values():
        if tk is None:
            continue
        for p in range(len(tk) - n + 1):
            g = " ".join(tk[p:p + n])
            cnt[int(hashlib.md5(g.encode()).hexdigest()[:15], 16)] += 1
    out: dict[int, str | None] = {}
    for i, tk in toks.items():
        if tk is None:
            out[i] = None
            continue
        covered = [False] * len(tk)
        for p in range(len(tk) - n + 1):
            g = " ".join(tk[p:p + n])
            if cnt[int(hashlib.md5(g.encode()).hexdigest()[:15], 16)] >= min_count:
                covered[p:p + n] = [True] * n
        out[i] = " ".join(t for t, c in zip(tk, covered) if not c)
    return out
