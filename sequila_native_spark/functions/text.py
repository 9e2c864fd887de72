"""Text analysis: tokenization, quality scoring, language ID, fingerprints.

All pure Catalyst column expressions (whole-stage codegen, no UDFs), each
with a direct ANSI-SQL twin so results are oracle-comparable. Ratios are
emitted integer-scaled (``floor(x * 1000)`` → ``*_milli``) so cross-engine
hashes match exactly.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-hit heuristic.
# Order is the deterministic tie-break priority for lang_id.
STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "im"],
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "una"],
    "fr": ["le", "les", "et", "des", "une", "est", "dans", "pour", "que", "qui"],
    "zh": ["的", "了", "是", "在", "我", "有", "和", "就", "不", "人"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokens, lowercased. Single-space split keeps exact parity
    with SQL ``string_split(text, ' ')`` semantics."""
    return F.split(F.lower(col), " ")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


# BPE-ish subword segmentation proxy: alpha runs count 1, each digit counts
# 1, each other non-space symbol counts 1 — the shape of byte-pair vocab
# behavior (words mostly whole, numbers split per digit, punctuation split).
BPE_ISH_PATTERN = "[a-z]+|[0-9]|[^a-z0-9 ]"


def token_count_bpe(col: Column) -> Column:
    """Approximate LLM-token count via the BPE-ish regex (JVM-side).

    SQL twin: ``len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9 ]'))``.
    """
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(BPE_ISH_PATTERN), F.lit(0)))


def stopword_hits(col: Column, lang: str) -> Column:
    """Number of token occurrences that are stopwords of ``lang``."""
    stop = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(stop, t)))


def quality_features(col: Column) -> dict[str, Column]:
    """Deterministic quality signals for a document column.

    - ``n_chars`` / ``n_tokens`` / ``n_distinct_tokens``
    - ``ttr_milli``: type-token ratio ×1000 (lexical diversity)
    - ``stop_milli``: English-stopword occurrence ratio ×1000
    - ``quality_milli``: composite = ttr + stopword signal (a document with
      near-zero stopwords or near-zero diversity is likely non-natural text)
    """
    toks = tokens(col)
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    hits = stopword_hits(col, "en")
    ttr = F.floor(n_distinct * 1000.0 / n_tokens).cast("bigint")
    stop = F.floor(hits * 1000.0 / n_tokens).cast("bigint")
    return {
        "n_chars": F.length(col).cast("bigint"),
        "n_tokens": n_tokens.cast("bigint"),
        "n_bpe_tokens": token_count_bpe(col).cast("bigint"),
        "n_distinct_tokens": n_distinct.cast("bigint"),
        "ttr_milli": ttr,
        "stop_milli": stop,
        "quality_milli": (ttr + stop).cast("bigint"),
    }


def lang_id(col: Column) -> Column:
    """Stopword-hit language heuristic.

    Picks the language with the most stopword occurrences; ties resolve to
    the first language in ``STOPWORDS`` order; all-zero → ``'und'``. The
    when-chain shape is mirrored 1:1 in the SQL oracle.
    """
    scores = {lang: stopword_hits(col, lang) for lang in STOPWORDS}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # build from lowest priority upward so the first lang wins ties
    for lang in reversed(list(STOPWORDS)):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best <= 0, F.lit("und")).otherwise(expr)


def lang_id_sql(text_expr: str = "text") -> str:
    """The DuckDB twin of :func:`lang_id` (same when-chain, same priority)."""
    def hits(lang: str) -> str:
        arr = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        return (
            f"len(list_filter(string_split(lower({text_expr}), ' '), "
            f"t -> list_contains([{arr}], t)))"
        )

    score_cols = {lang: hits(lang) for lang in STOPWORDS}
    best = "greatest(" + ", ".join(score_cols.values()) + ")"
    expr = "'und'"
    for lang in reversed(list(STOPWORDS)):
        expr = f"CASE WHEN {score_cols[lang]} = {best} THEN '{lang}' ELSE {expr} END"
    return f"CASE WHEN {best} <= 0 THEN 'und' ELSE {expr} END"


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.

    SQL twin: ``md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))``.
    """
    return F.md5(F.lower(F.trim(F.regexp_replace(col, r"\s+", " "))))


FINGERPRINT_SQL = "md5(lower(trim(regexp_replace({col}, '\\s+', ' ', 'g'))))"


def winnow_fingerprints(
    col: Column, k: int = 8, w: int = 4, hash_family: str = "md5"
) -> Column:
    """Winnowed rolling-hash fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): hash every character ``k``-gram of the normalized text,
    keep the minimum hash of each window of ``w`` consecutive k-gram hashes,
    return the sorted distinct selection.

    Guarantees: any substring match of length ≥ ``k + w − 1`` between two
    documents shares ≥1 selected fingerprint, yet only ~``2/(w+1)`` of all
    k-gram hashes are kept — the standard local document-fingerprinting
    trade-off for plagiarism / near-dup detection at corpus scale.

    ``hash_family``:

    - ``"md5"`` (default): md5 hex digests, bit-identical to the DuckDB twin
      :func:`winnow_fingerprints_oracle_sql` (ties inside a window resolve to
      the lexicographically-minimal digest in both engines). Array of hex
      strings. The per-gram md5 cost is cut by (a) hashing the UTF-8 bytes of
      the normalized text sliced ONCE (byte k-grams == character k-grams for
      ASCII text; non-ASCII falls back to per-gram encode) and (b) a
      per-batch gram→digest cache — near-dup corpora repeat most grams, so
      the cache turns the md5 loop into dict hits.
    - ``"fast"``: pandas' siphash (``pd.util.hash_array``, deterministic
      fixed key, C speed) + numpy sliding-window min — the engine-default
      scale family, same dual-family pattern as MinHash
      (``dedup.minhash_signature_vectorized``). Array of int64 (top bit
      shifted off). Same winnowing guarantee; no SQL twin by construction,
      so use ``"md5"`` where oracle parity matters. Window-position parity
      with the md5 family is pinned in tests/test_text_dedup.py.

    Arrow pandas UDF either way (per-position hashing is the shape
    Catalyst's interpreted HOFs do worst — see DESIGN.md).
    """
    from pyspark.sql.types import ArrayType, LongType, StringType

    if hash_family not in ("md5", "fast"):
        raise ValueError(
            f"hash_family must be 'md5' or 'fast', got {hash_family!r}"
        )

    if hash_family == "fast":

        @F.pandas_udf(ArrayType(LongType()))
        def wf_fast(texts: pd.Series) -> pd.Series:
            import numpy as np
            import re as _re
            from numpy.lib.stride_tricks import sliding_window_view

            out = []
            for t in texts:
                if t is None:
                    out.append([])
                    continue
                s = _re.sub(r"\s+", " ", t).strip().lower()
                m = len(s) - k + 1
                if m < 1:
                    out.append([])
                    continue
                grams = np.fromiter(
                    (s[i : i + k] for i in range(m)), dtype=object, count=m
                )
                h = (
                    pd.util.hash_array(grams) >> np.uint64(1)
                ).astype(np.int64)
                if m <= w:
                    sel = h.min(initial=np.iinfo(np.int64).max)
                    out.append([int(sel)])
                else:
                    sel = sliding_window_view(h, w).min(axis=1)
                    out.append(np.unique(sel).tolist())
            return pd.Series(out)

        return wf_fast(col)

    @F.pandas_udf(ArrayType(StringType()))
    def wf(texts: pd.Series) -> pd.Series:
        from hashlib import md5 as _md5
        import re as _re

        cache: dict = {}  # per-batch; near-dup corpora repeat most grams
        out = []
        for t in texts:
            if t is None:
                out.append([])
                continue
            s = _re.sub(r"\s+", " ", t).strip().lower()
            m = len(s) - k + 1
            if m < 1:
                out.append([])
                continue
            if s.isascii():
                # byte slicing == char slicing for ASCII: encode once
                b = s.encode()
                grams = [b[i : i + k] for i in range(m)]
            else:
                grams = [s[i : i + k].encode("utf-8") for i in range(m)]
            hashes = []
            append = hashes.append
            get = cache.get
            for g in grams:
                d = get(g)
                if d is None:
                    d = _md5(g).hexdigest()
                    cache[g] = d
                append(d)
            if m <= w:
                sel = {min(hashes)}
            else:
                sel = {min(hashes[j : j + w]) for j in range(m - w + 1)}
            out.append(sorted(sel))
        return pd.Series(out)

    return wf(col)


def winnow_fingerprints_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_expr: str = "text",
    k: int = 8,
    w: int = 4,
) -> str:
    """DuckDB twin of :func:`winnow_fingerprints`: per-doc summary query
    ``(id, n_fps, min_fp, max_fp)``. The hash list is materialized once per
    document (MATERIALIZED CTE) — inlining it into every window would make
    the oracle O(m²) in md5 calls."""
    s = f"lower(trim(regexp_replace({text_expr}, '\\s+', ' ', 'g')))"
    return f"""
WITH h AS MATERIALIZED (
  SELECT {id_col} AS id,
         list_transform(range(1, length({s}) - {k} + 2),
                        i -> md5({s}[i : i + {k - 1}])) AS hashes
  FROM {table}
), sel AS (
  SELECT id,
         CASE WHEN len(hashes) < 1 THEN CAST([] AS VARCHAR[])
              WHEN len(hashes) <= {w} THEN [list_min(hashes)]
              ELSE list_sort(list_distinct(list_transform(
                     range(1, len(hashes) - {w} + 2),
                     j -> list_min(hashes[j : j + {w - 1}])))) END AS fps
  FROM h
)
SELECT id AS {id_col}, CAST(len(fps) AS BIGINT) AS n_fps,
       list_min(fps) AS min_fp, list_max(fps) AS max_fp
FROM sel
"""


def winnow_containment_pairs(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 8,
    w: int = 4,
    threshold_milli: int = 800,
    hash_family: str = "md5",
    prefix_extra: int = 200,
):
    """Containment near-dup pairs: documents sharing ≥ ``threshold_milli``/1000
    of EITHER side's winnowed fingerprints — catches A-pasted-inside-B, which
    symmetric Jaccard under-scores when |B| ≫ |A|.

    ``hash_family``: forwarded to :func:`winnow_fingerprints` — ``"md5"``
    (default, DuckDB-oracle-parity) or ``"fast"`` (siphash + numpy window
    min; same pairs up to hash collisions, which the ≥-threshold shared-count
    test makes vanishingly unlikely to matter).

    Plan shape — PREFIX-FILTERED inverted index (exact, no recall loss):
    the naive postings self-join costs Σ df(fp)² over fingerprint document
    frequencies, and boilerplate "stop-fingerprints" shared by most of a
    near-dup corpus make that quadratic (measured 190M join tuples → 11.7M
    intermediate pairs for 25 outputs at sf0.1). Instead:

    1. one fingerprint-UDF pass (lazily checkpointed — every later branch
       reads the one materialization);
    2. global df per fingerprint (tiny aggregate, broadcast back);
    3. PREFIX postings: per doc keep the ``(n − ⌈t·n⌉ + 1) + e`` fingerprints
       with the smallest ``(df, fp)``, where ``e = ⌊n·prefix_extra/1000⌋`` —
       pigeonhole: a qualifying pair shares ``≥ ⌈t·min(n_a, n_b)⌉``
       fingerprints, at most ``n_s − p_s`` of which can miss the smaller
       doc's prefix, so ``≥ 1 + e`` must land IN it, whatever the prefix is;
       rare-first ordering minimizes join fan-out (stop-fingerprints never
       enter minimal prefixes);
    4. count prefix matches per ``(n, id)``-ordered pair (each unordered pair
       probed exactly once, smaller side supplying the prefix) — one narrow
       equi-join + groupBy — and keep pairs with ``≥ p_s − n_s + ⌈t·n_s⌉``
       matches (= ``1 + e``; degenerates to the exact count when the capped
       prefix is the whole doc);
    5. exact verification on the count-filtered survivors only:
       ``array_intersect`` of the two full fingerprint arrays, JVM-side.

    At ``t = 0.8`` with the default ``prefix_extra = 200`` prefixes hold
    ~40% of each doc's fingerprints and the count filter requires ~0.2·n_s
    shared prefix elements, so near-threshold true pairs survive to
    verification while the quadratic bulk dies at the count filter; results
    stay exactly those of the full self-join. Measured at sf0.1 on the
    driver corpus — an adversarially FLAT df distribution (6.6k distinct
    fingerprints, mean df 84, so no fingerprint is rare): join tuples
    190M → 15.3M, pair candidates 11.7M → 742, for the same 257 outputs;
    on Zipfian real-text corpora the rare-first prefixes prune harder still.

    Output: ``id_a < id_b``, ``n_shared``, ``n_a``, ``n_b``,
    ``contain_a_milli`` (shared/|fp(A)|), ``contain_b_milli``; rows where
    ``max(contain_a, contain_b) >= threshold_milli``.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sequila_native_spark.util import ensure_parallel

    fps = ensure_parallel(df.select(id_col, text_col)).select(
        F.col(id_col).alias("__sq_id"),
        winnow_fingerprints(F.col(text_col), k, w, hash_family).alias("__sq_fps"),
    )
    fps = fps.where(F.size("__sq_fps") > 0).withColumn(
        "__sq_n", F.size("__sq_fps")
    )
    from sequila_native_spark.util import lib_checkpoint

    try:
        # one UDF evaluation for all consumers (DESIGN.md rule)
        fps = lib_checkpoint(fps)
    except Exception:
        pass
    post = fps.select("__sq_id", "__sq_n", F.explode("__sq_fps").alias("__sq_fp"))
    # global document frequency per fingerprint: distinct-fp cardinality is
    # tiny next to postings, so it broadcasts back onto the postings
    df_tbl = post.groupBy("__sq_fp").agg(F.count(F.lit(1)).alias("__sq_df"))
    # per-doc prefix size: minimal sound size n - ceil(t*n) + 1 (integer ceil
    # via (x+999)//1000) widened by e = floor(n*prefix_extra/1000), capped at
    # n. The count filter below needs >= (prefix_len - n + ceil(t*n)) prefix
    # matches — 1 + e in the uncapped case, the exact ceil(t*n_s) when the
    # cap makes the prefix the whole doc.
    ceil_tn = F.floor((F.col("__sq_n") * threshold_milli + 999) / 1000)
    prefix_len = F.least(
        F.col("__sq_n").cast("long"),
        F.col("__sq_n")
        - ceil_tn
        + 1
        + F.floor(F.col("__sq_n") * prefix_extra / 1000),
    )
    rn = F.row_number().over(
        Window.partitionBy("__sq_id").orderBy("__sq_df", "__sq_fp")
    )
    pref = (
        post.join(F.broadcast(df_tbl), "__sq_fp")
        .withColumn("__sq_rn", rn)
        .where(F.col("__sq_rn") <= prefix_len)
        .select(
            F.col("__sq_id").alias("__sq_id_s"),
            F.col("__sq_n").alias("__sq_n_s"),
            (prefix_len - F.col("__sq_n") + ceil_tn).alias("__sq_thr"),
            "__sq_fp",
        )
    )
    full = post.select(
        F.col("__sq_id").alias("__sq_id_l"),
        F.col("__sq_n").alias("__sq_n_l"),
        "__sq_fp",
    )
    smaller_first = (F.col("__sq_n_s") < F.col("__sq_n_l")) | (
        (F.col("__sq_n_s") == F.col("__sq_n_l"))
        & (F.col("__sq_id_s") < F.col("__sq_id_l"))
    )
    cand = (
        pref.join(full, "__sq_fp")
        .where(smaller_first)
        .groupBy("__sq_id_s", "__sq_id_l")
        .agg(
            F.count(F.lit(1)).alias("__sq_pref_shared"),
            F.first("__sq_thr").alias("__sq_thr"),
        )
        .where(F.col("__sq_pref_shared") >= F.col("__sq_thr"))
        .select("__sq_id_s", "__sq_id_l")
    )
    fa = fps.select(
        F.col("__sq_id").alias("__sq_id_s"), F.col("__sq_fps").alias("__sq_fa")
    )
    fb = fps.select(
        F.col("__sq_id").alias("__sq_id_l"), F.col("__sq_fps").alias("__sq_fb")
    )
    v = (
        cand.join(fa, "__sq_id_s")
        .join(fb, "__sq_id_l")
        .withColumn(
            "n_shared",
            F.size(F.array_intersect("__sq_fa", "__sq_fb")).cast("bigint"),
        )
        .withColumn("__sq_ns", F.size("__sq_fa"))
        .withColumn("__sq_nl", F.size("__sq_fb"))
        # shared*1000 >= t*min(n) == max(contain) >= t, integers only
        .where(
            F.col("n_shared") * 1000
            >= F.lit(threshold_milli) * F.least("__sq_ns", "__sq_nl")
        )
    )
    id_a = F.least("__sq_id_s", "__sq_id_l")
    n_a = F.when(F.col("__sq_id_s") == id_a, F.col("__sq_ns")).otherwise(
        F.col("__sq_nl")
    )
    n_b = F.when(F.col("__sq_id_s") == id_a, F.col("__sq_nl")).otherwise(
        F.col("__sq_ns")
    )
    out = v.select(
        id_a.alias("id_a"),
        F.greatest("__sq_id_s", "__sq_id_l").alias("id_b"),
        "n_shared",
        n_a.cast("bigint").alias("n_a"),
        n_b.cast("bigint").alias("n_b"),
    )
    return out.select(
        "id_a", "id_b", "n_shared", "n_a", "n_b",
        F.floor(F.col("n_shared") * 1000 / F.col("n_a")).cast("bigint").alias("contain_a_milli"),
        F.floor(F.col("n_shared") * 1000 / F.col("n_b")).cast("bigint").alias("contain_b_milli"),
    )


def winnow_containment_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_expr: str = "text",
    k: int = 8,
    w: int = 4,
    threshold_milli: int = 800,
) -> str:
    """DuckDB twin of :func:`winnow_containment_pairs` (same fps CTE shape as
    :func:`winnow_fingerprints_oracle_sql`, then unnest + self-join)."""
    s = f"lower(trim(regexp_replace({text_expr}, '\\s+', ' ', 'g')))"
    return f"""
WITH h AS MATERIALIZED (
  SELECT {id_col} AS id,
         list_transform(range(1, length({s}) - {k} + 2),
                        i -> md5({s}[i : i + {k - 1}])) AS hashes
  FROM {table}
), sel AS (
  SELECT id,
         CASE WHEN len(hashes) < 1 THEN CAST([] AS VARCHAR[])
              WHEN len(hashes) <= {w} THEN [list_min(hashes)]
              ELSE list_sort(list_distinct(list_transform(
                     range(1, len(hashes) - {w} + 2),
                     j -> list_min(hashes[j : j + {w - 1}])))) END AS fps
  FROM h
), nz AS (SELECT id, fps FROM sel WHERE len(fps) > 0),
f AS (SELECT id, unnest(fps) AS fp FROM nz),
sz AS (SELECT id, len(fps) AS n FROM nz),
shared AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared
  FROM f a JOIN f b ON a.fp = b.fp AND a.id < b.id
  GROUP BY 1, 2
)
SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared,
       CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
       CAST(floor(n_shared * 1000 / sa.n) AS BIGINT) AS contain_a_milli,
       CAST(floor(n_shared * 1000 / sb.n) AS BIGINT) AS contain_b_milli
FROM shared JOIN sz sa ON id_a = sa.id JOIN sz sb ON id_b = sb.id
WHERE greatest(floor(n_shared * 1000 / sa.n),
               floor(n_shared * 1000 / sb.n)) >= {threshold_milli}
"""


# Symmetric default token cap for the repetition features: bounds the
# O(distinct_bigrams × n_bigrams) modal-bigram scan for adversarial
# documents (a 100k-distinct-token doc would otherwise cost ~10^10
# comparisons inside one codegen row). 2000 tokens ⇒ ≤4×10^6 comparisons,
# and a 2000-token prefix is ample signal for loop/boilerplate detection
# (repetition is a local property). The INPUT STRING is also truncated to
# 10×max_tokens characters before tokenizing: Catalyst does not eliminate
# common subexpressions inside higher-order-function lambdas, so the
# tokenize of the raw string would otherwise re-run per lambda step —
# bounding the string bounds every re-evaluation. Both caps are applied
# IDENTICALLY in the operator and the SQL twin, so oracle comparisons stay
# exact; None disables both.
DEFAULT_REPETITION_TOKEN_CAP = 2_000


def repetition_features(
    col: Column, max_tokens: int | None = DEFAULT_REPETITION_TOKEN_CAP
) -> dict[str, Column]:
    """Gopher-style repetition signals (the classic heuristics for dropping
    boilerplate / templated / looping documents), pure Catalyst:

    - ``n_lines`` / ``n_distinct_lines``: newline-split segments (empties
      dropped);
    - ``dup_line_milli``: fraction of lines that are repeats of an earlier
      line, ×1000 ("duplicate line fraction");
    - ``top_bigram_milli``: occurrences of the most frequent word bigram over
      total bigrams, ×1000 (loop/chant detector);
    - ``max_word_run``: longest run of the SAME token repeated consecutively.

    Each has an exact SQL twin (:func:`repetition_features_sql`); everything
    is integer-scaled so cross-engine hashes match.

    COST LIMIT: ``top_bigram_milli`` is O(distinct_bigrams × n_bigrams)
    inside codegen per document, so the token-based features evaluate over
    only the FIRST ``max_tokens`` tokens of the first ``10×max_tokens``
    characters (Gopher-style filters conventionally truncate long documents
    anyway; the line features stay uncapped — they are linear). The string
    cap matters as much as the token cap: lambda bodies re-evaluate their
    argument expressions per step, so tokenizing an unbounded string inside
    the scan would dominate. Caps are applied identically in
    :func:`repetition_features_sql` so cross-engine hashes still match;
    pass ``max_tokens=None`` to disable (both sides!).
    """
    lines = F.filter(F.split(col, "\n"), lambda x: F.length(F.trim(x)) > 0)
    n_lines = F.size(lines)
    n_distinct_lines = F.size(F.array_distinct(lines))
    dup_line = F.when(
        n_lines > 0,
        F.floor((n_lines - n_distinct_lines) * 1000.0 / n_lines),
    ).otherwise(F.lit(0)).cast("bigint")

    if max_tokens is not None:
        if max_tokens <= 0:
            raise ValueError(f"max_tokens must be positive or None, got {max_tokens}")
        toks = F.slice(
            tokens(F.substring(col, 1, 10 * max_tokens)), 1, max_tokens
        )
    else:
        toks = tokens(col)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws("\x1f", a, b),
    )
    n_bigrams = F.size(bigrams)
    # occurrences of the modal bigram = longest run of equal values in the
    # SORTED bigram array — O(n log n) sort + O(n) run-length aggregate,
    # replacing the r4 O(distinct × n) filter-per-distinct scan (measured
    # 12× faster at sf0.1, and the lambda no longer re-evaluates the bigram
    # expression per step — HOFs get no common-subexpression elimination)
    top_bigram = F.aggregate(
        F.array_sort(bigrams),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    top_bigram_milli = F.when(
        n_bigrams > 0, F.floor(top_bigram * 1000.0 / n_bigrams)
    ).otherwise(F.lit(0)).cast("bigint")

    # longest consecutive same-token run via aggregate over (prev, run, best)
    run_state = F.aggregate(
        toks,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return {
        "n_lines": n_lines.cast("bigint"),
        "n_distinct_lines": n_distinct_lines.cast("bigint"),
        "dup_line_milli": dup_line,
        "top_bigram_milli": top_bigram_milli,
        "max_word_run": run_state.cast("bigint"),
    }


def repetition_features_sql(
    text_expr: str = "text",
    max_tokens: int | None = DEFAULT_REPETITION_TOKEN_CAP,
) -> dict[str, str]:
    """DuckDB twins of :func:`repetition_features`, keyed like its output
    (``max_tokens`` must match the operator's — same cap, same values)."""
    lines = (
        f"list_filter(string_split({text_expr}, chr(10)), "
        f"x -> length(trim(x)) > 0)"
    )
    toks = f"string_split(lower({text_expr}), ' ')"
    if max_tokens is not None:
        if max_tokens <= 0:
            raise ValueError(f"max_tokens must be positive or None, got {max_tokens}")
        toks = (
            f"list_slice(string_split(lower("
            f"substr({text_expr}, 1, {10 * max_tokens})), ' '), 1, {max_tokens})"
        )
    bigrams = (
        f"list_transform(range(1, len({toks})), "
        f"i -> {toks}[i] || chr(31) || {toks}[i + 1])"
    )
    # modal-bigram count via plain GROUP BY (the twin needs the same VALUE,
    # not the same algorithm; DuckDB's quadratic list_filter scan was the
    # r4 formulation)
    top = (
        f"(SELECT max(cnt) FROM ("
        f"SELECT count(*) AS cnt FROM (SELECT unnest({bigrams}) AS b) "
        f"GROUP BY b))"
    )
    runs = (
        f"(SELECT max(cnt) FROM ("
        f"SELECT count(*) AS cnt FROM ("
        f"SELECT t, i - row_number() OVER (PARTITION BY t ORDER BY i) AS grp, i "
        f"FROM (SELECT unnest({toks}) AS t, "
        f"generate_subscripts({toks}, 1) AS i)) GROUP BY t, grp))"
    )
    return {
        "n_lines": f"CAST(len({lines}) AS BIGINT)",
        "n_distinct_lines": f"CAST(len(list_distinct({lines})) AS BIGINT)",
        "dup_line_milli": (
            f"CAST(CASE WHEN len({lines}) > 0 THEN floor("
            f"(len({lines}) - len(list_distinct({lines}))) * 1000.0 / len({lines})"
            f") ELSE 0 END AS BIGINT)"
        ),
        "top_bigram_milli": (
            f"CAST(CASE WHEN len({bigrams}) > 0 THEN floor("
            f"COALESCE({top}, 0) * 1000.0 / len({bigrams})) ELSE 0 END AS BIGINT)"
        ),
        "max_word_run": f"CAST(COALESCE({runs}, 0) AS BIGINT)",
    }


def filter_documents(
    df,
    text_col: str = "text",
    *,
    min_tokens: int = 10,
    max_tokens: int | None = None,
    min_ttr_milli: int = 100,
    min_stop_milli: int = 10,
    max_dup_line_milli: int = 300,
    max_top_bigram_milli: int = 180,
    max_word_run: int = 8,
    languages: list[str] | None = None,
    keep_reasons: bool = False,
):
    """Gopher-style document-quality filter: the standard pre-training
    cleanup pass composed from this module's features — all pure Catalyst,
    one scan, no shuffle.

    Rules (each threshold disables with ``None``):

    - token count in ``[min_tokens, max_tokens]``;
    - type-token ratio ≥ ``min_ttr_milli`` (dedup-by-diversity: near-constant
      documents die here);
    - stopword ratio ≥ ``min_stop_milli`` (natural-language test — tables,
      code and UI chrome have almost none);
    - duplicate-line fraction ≤ ``max_dup_line_milli``;
    - modal-bigram share ≤ ``max_top_bigram_milli`` (loop/chant detector);
    - longest same-token run ≤ ``max_word_run``;
    - predicted language ∈ ``languages`` (None = any).

    Returns the surviving rows unchanged; with ``keep_reasons=True`` returns
    ALL rows plus a ``filter_reasons`` array column naming every failed rule
    (empty array = kept) — the audit shape used when tuning thresholds on a
    sample before a full-corpus run.
    """
    from pyspark.sql import functions as F

    q = quality_features(F.col(text_col))
    r = repetition_features(F.col(text_col))
    rules: list[tuple[str, Column]] = []
    if min_tokens is not None:
        rules.append(("too_few_tokens", q["n_tokens"] >= min_tokens))
    if max_tokens is not None:
        rules.append(("too_many_tokens", q["n_tokens"] <= max_tokens))
    if min_ttr_milli is not None:
        rules.append(("low_diversity", q["ttr_milli"] >= min_ttr_milli))
    if min_stop_milli is not None:
        rules.append(("low_stopword_ratio", q["stop_milli"] >= min_stop_milli))
    if max_dup_line_milli is not None:
        rules.append(("duplicate_lines", r["dup_line_milli"] <= max_dup_line_milli))
    if max_top_bigram_milli is not None:
        rules.append(("repeated_bigram", r["top_bigram_milli"] <= max_top_bigram_milli))
    if max_word_run is not None:
        rules.append(("token_run", r["max_word_run"] <= max_word_run))
    if languages is not None:
        lang_arr = F.array(*[F.lit(x) for x in languages])
        rules.append(("language", F.array_contains(lang_arr, lang_id(F.col(text_col)))))
    if keep_reasons:
        reasons = F.filter(
            F.array(*[
                F.when(~ok, F.lit(name)).otherwise(F.lit(None)) for name, ok in rules
            ]),
            lambda x: x.isNotNull(),
        )
        return df.withColumn("filter_reasons", reasons)
    keep = F.lit(True)
    for _, ok in rules:
        keep = keep & ok
    return df.where(keep)


def normalize_text(
    col: Column,
    *,
    lower: bool = True,
    strip_control: bool = True,
    collapse_whitespace: bool = True,
) -> Column:
    """Standard pre-tokenization text cleanup, pure Catalyst (codegen'd):

    - ``strip_control``: drop C0/C1 control characters (except ``\\t \\n \\r``,
      which become whitespace below) and the zero-width/format characters
      that break tokenizers (ZWSP/ZWNJ/ZWJ/BOM, soft hyphen);
    - ``collapse_whitespace``: any whitespace run → one space, ends trimmed;
    - ``lower``: lowercase last (so the flags compose deterministically).

    SQL twin: :func:`normalize_text_sql` with the same flags — a cleanup
    pass both engines compute identically, so downstream fingerprints /
    shingles stay oracle-comparable when pipelines normalize first.
    """
    out = col
    if strip_control:
        out = F.regexp_replace(
            out, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f\\u200b-\\u200d\\ufeff\\u00ad]", ""
        )
    if collapse_whitespace:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    if lower:
        out = F.lower(out)
    return out


def normalize_text_sql(
    text_expr: str = "text",
    *,
    lower: bool = True,
    strip_control: bool = True,
    collapse_whitespace: bool = True,
) -> str:
    """DuckDB twin of :func:`normalize_text` (same flag semantics; RE2
    spells codepoints ``\\x{200b}`` where Java uses ``\\u200b``)."""
    out = text_expr
    if strip_control:
        out = (
            f"regexp_replace({out}, "
            f"'[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f"
            f"\\x{{200b}}-\\x{{200d}}\\x{{feff}}\\x{{00ad}}]', '', 'g')"
        )
    if collapse_whitespace:
        out = f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"
    if lower:
        out = f"lower({out})"
    return out
