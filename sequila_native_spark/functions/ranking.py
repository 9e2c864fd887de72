"""TF-IDF / BM25 ranking over a document corpus — inverted-index Spark-first.

The retrieval/quality-scoring half of a training-data pipeline: score
documents against queries (dataset curation by relevance, contamination
checks against eval sets, nearest-text lookups) without an external search
engine. Same architecture as the dedup family: tokenize once, build an
inverted index (term → postings) with ordinary shuffles, join query terms
against it, aggregate per (query, doc).

100 TB shape:

- the index is ``explode`` + two hash aggregations — map-side combinable,
  one shuffle on ``term`` then one on ``(doc)``; no driver state;
- query sets are small by nature → broadcast to the postings join, so
  scoring touches only postings of query terms (inverted-index pruning —
  never a full corpus scan per query);
- ``min_df`` / ``max_df_ratio`` drop hapax noise and stop-terms the same
  way the dedup module prunes stop-shingles, bounding the hottest postings
  lists;
- top-k per query via window rank over the (small) scored candidates.

Determinism: term statistics (tf, df, doc lengths) are exact integers with
a DuckDB twin (`term_stats_sql`). BM25 scores are IEEE-double expressions
(`ln`), so the score itself is NOT hash-oracle material across engines —
ranking ties are broken by ``doc_id`` so the top-k SET is stable within
Spark; unit tests pin scores against an independent Python implementation.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sequila_native_spark.functions.text import tokens


def _terms(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term) occurrence rows — empty tokens dropped."""
    return (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .where(F.length("term") > 0)
    )


def term_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_df: int = 1,
    max_df_ratio: float = 1.0,
) -> DataFrame:
    """Per-(doc, term) frequency with corpus document frequency:
    ``(doc_id, term, tf, df)`` — the exact-integer core of TF-IDF/BM25.

    ``min_df`` drops terms appearing in fewer documents (hapax noise);
    ``max_df_ratio`` drops terms appearing in more than that fraction of
    the corpus (stop-terms — the inverted index's hottest, least useful
    postings lists). Both prune the INDEX, which is what bounds postings
    skew at scale.
    """
    if not (0.0 < max_df_ratio <= 1.0):
        raise ValueError(f"max_df_ratio must be in (0, 1], got {max_df_ratio}")
    occ = _terms(docs, id_col, text_col)
    tf = occ.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.countDistinct(id_col).alias("__n"))
    df_ = df_.crossJoin(F.broadcast(n_docs)).where(
        (F.col("df") >= F.lit(int(min_df)))
        & (F.col("df") <= F.floor(F.col("__n") * F.lit(float(max_df_ratio))))
    ).select("term", "df")
    return tf.join(df_, "term").select(id_col, "term", "tf", "df")


def term_stats_sql(
    table: str = "documents",
    text_expr: str = "text",
    id_col: str = "doc_id",
    *,
    min_df: int = 1,
    max_df_ratio: float = 1.0,
) -> str:
    """DuckDB twin of :func:`term_stats` (exact integers)."""
    return f"""
        WITH occ AS (
            SELECT {id_col}, unnest(string_split(lower({text_expr}), ' ')) AS term
            FROM {table}
        ),
        tf AS (
            SELECT {id_col}, term, count(*) AS tf
            FROM occ WHERE length(term) > 0
            GROUP BY {id_col}, term
        ),
        n AS (SELECT count(DISTINCT {id_col}) AS n_docs FROM {table}),
        dfq AS (
            SELECT term, count(*) AS df FROM tf GROUP BY term
        )
        SELECT t.{id_col}, t.term, t.tf, d.df
        FROM tf t JOIN dfq d ON t.term = d.term, n
        WHERE d.df >= {int(min_df)}
          AND d.df <= floor(n.n_docs * {float(max_df_ratio)})
    """


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query",
    k1: float = 1.2,
    b: float = 0.75,
    min_df: int = 1,
    max_df_ratio: float = 1.0,
) -> DataFrame:
    """Top-``k`` documents per query under BM25 (Robertson/Sparck Jones):

    ``score(q, d) = Σ_t idf(t) · tf · (k1+1) / (tf + k1·(1−b+b·len/avgdl))``
    with ``idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))`` over the distinct
    query terms. ``N`` counts distinct ids over ALL docs — the same corpus
    size the ``max_df_ratio`` ceiling uses — and empty documents enter
    ``avgdl`` with length 0. Returns ``(query_id, doc_id, rank, score)``;
    ties on the exact score break on ``doc_id`` so the output is
    deterministic for a given set of scores.

    NEAR-TIE CAVEAT: scores are IEEE-double sums, and the per-(query, doc)
    summation order can vary with partitioning — two documents whose true
    scores differ by less than the accumulated round-off (~1 ULP per
    addend) could in principle swap ranks across repartitionings. The
    ``(query_id, doc_id, rank)`` set is pinned invariant across
    partitioning/row-order/shuffle-width perturbations for the test corpora
    (tests/test_ranking.py::test_bm25_rank_set_partition_invariant); for
    adversarial exact-tie corpora, treat ranks within a score epsilon as
    unordered.

    Plan: inverted index (term postings) ⨝ broadcast query terms → per
    (query, doc) sum → window top-k. Only postings of query terms are
    touched; corpus size enters through two broadcast scalars (N, avgdl).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    stats = term_stats(
        docs, text_col, id_col, min_df=min_df, max_df_ratio=max_df_ratio
    )
    doclen = _terms(docs, id_col, text_col).groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__dl")
    )
    # N from the SAME source as term_stats' max_df_ratio ceiling (distinct
    # ids over ALL docs — empty/whitespace-only documents count, with
    # length 0 entering avgdl), so idf and the df ceiling can never see two
    # different corpus sizes (advisor finding, r5)
    n_docs = docs.select(F.countDistinct(id_col).alias("__n"))
    corpus = (
        doclen.agg(F.sum("__dl").alias("__sumdl"))
        .crossJoin(F.broadcast(n_docs))
        .select("__n", (F.col("__sumdl") / F.col("__n")).alias("__avgdl"))
    )
    qterms = (
        _terms(queries, query_id_col, query_text_col)
        .distinct()  # BM25 over distinct query terms
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (
        F.col("tf") * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl"))
        )
    )
    scored = (
        stats.join(F.broadcast(qterms), "term")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(corpus))
        .withColumn("__s", idf * tf_part)
        .groupBy(query_id_col, id_col)
        .agg(F.sum("__s").alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", "score")
    )


def bm25_score_py(
    doc_tokens: list[str], query_terms: set[str], df_by_term: dict[str, int],
    n_docs: int, avgdl: float, k1: float = 1.2, b: float = 0.75,
) -> float:
    """Independent reference implementation for tests (not a Spark path)."""
    from collections import Counter

    tf = Counter(doc_tokens)
    dl = len(doc_tokens)
    s = 0.0
    for t in query_terms:
        if t not in tf or t not in df_by_term:
            continue
        df = df_by_term[t]
        idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        s += idf * tf[t] * (k1 + 1.0) / (tf[t] + k1 * (1.0 - b + b * dl / avgdl))
    return s
