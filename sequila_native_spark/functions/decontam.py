"""Benchmark decontamination: drop training documents that overlap an
evaluation set.

The standard production shape (13-gram overlap in GPT-3/Gopher/Dolma style
pipelines): a document is *contaminated* when it shares at least one word
n-gram with any benchmark document. Detection reuses the distinct-shingle
machinery from :mod:`.dedup` (``shingles`` / ``shingles_sql``), so the
Spark plan and the DuckDB oracle twin tokenize identically.

100 TB design: the benchmark side (eval sets — thousands of docs, not
billions) collapses to a DISTINCT n-gram set that is explicitly
``broadcast()``; the corpus side streams its n-grams in-scan (Catalyst HOF
``transform`` over ``sequence`` — no UDF) and probes the broadcast hash
table. No corpus-side shuffle at all for flagging; the final
``groupBy(doc_id)`` aggregates only the *hit* rows (contaminated docs ×
shared grams — tiny relative to the corpus). ``decontaminate`` is then a
broadcast anti-join on the flagged id set.

Reference context: no counterpart in the reference engine (sequila-native);
companion LLM-data-pipeline layer (SURVEY.md §6), same family as
``dedup_against_corpus`` (corpus-delta dedup) — asymmetric small-vs-huge
with candidates generated only across sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import shingles, shingles_sql


def benchmark_ngrams(
    benchmark: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """DISTINCT word n-grams of the benchmark side — one column ``gram``.

    Small by construction (eval sets); callers broadcast it.
    """
    return (
        benchmark.select(F.explode(shingles(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Per-contaminated-document overlap profile:
    ``(id_col, n_shared)`` where ``n_shared`` is the number of DISTINCT
    n-grams the document shares with the benchmark set. Clean documents do
    not appear.
    """
    grams = F.broadcast(benchmark_ngrams(benchmark, text_col, n))
    doc_grams = docs.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("gram")
    )
    return (
        doc_grams.join(grams, "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    flagged: DataFrame | None = None,
) -> DataFrame:
    """``docs`` minus every document flagged by :func:`contamination_report`
    (broadcast anti-join on the flagged id set — the flagged set is small,
    the corpus is never shuffled).

    Pass ``flagged`` (a prior :func:`contamination_report` result, or any
    DataFrame carrying ``id_col``) to reuse an already-computed report —
    a pipeline that wants both the report AND the clean set would otherwise
    pay the gram join twice (measured 2x on the driver row at sf0.1)."""
    if flagged is None:
        flagged = contamination_report(docs, benchmark, text_col, id_col, n)
    return docs.join(
        F.broadcast(flagged.select(id_col)), id_col, "left_anti"
    )


def contamination_report_sql(
    docs_rel: str,
    benchmark_rel: str,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    n: int = 8,
) -> str:
    """DuckDB twin of :func:`contamination_report`. ``docs_rel`` /
    ``benchmark_rel`` are relation expressions (table names or
    parenthesized subqueries)."""
    sh = shingles_sql(text_expr, n)
    return f"""
        WITH bg AS (
            SELECT DISTINCT unnest({sh}) AS gram FROM {benchmark_rel}
        ),
        dg AS (
            SELECT {id_expr} AS doc_id, unnest({sh}) AS gram FROM {docs_rel}
        )
        SELECT doc_id, count(*) AS n_shared
        FROM dg JOIN bg USING (gram)
        GROUP BY doc_id
    """
