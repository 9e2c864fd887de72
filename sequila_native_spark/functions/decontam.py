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


def match_contaminated(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 8,
    how: str = "left_semi",
) -> DataFrame:
    """Aggregation-free contamination filter: keep (``how='left_semi'``)
    or drop (``how='left_anti'``) documents sharing an n-gram with the
    benchmark, via a broadcast join on an ``array_contains`` condition.

    No groupBy and no state — this is the STREAMING-safe variant (a
    watermarkless stream can run it in append mode; the benchmark side is
    static, the usual production shape for eval sets). The join is a
    broadcast nested-loop per (row, gram) membership probe — fine for
    real eval-set gram counts (10^4-10^6 against a broadcast array scan);
    for huge benchmark sets on BATCH data prefer
    :func:`contamination_report` + :func:`decontaminate`, whose equi-join
    shuffles hit rows only.
    """
    if how not in ("left_semi", "left_anti"):
        raise ValueError(f"how must be left_semi or left_anti, got {how!r}")
    grams = F.broadcast(benchmark_ngrams(benchmark, text_col, n))
    # materialize the document's gram array as a COLUMN before the join:
    # a nested-loop join evaluates its condition per (row, gram) pair, and
    # an inline shingles() there would recompute the whole shingle set per
    # pair (measured: >180x slower at sf0.01)
    helper = "__match_grams"
    with_grams = docs.withColumn(helper, shingles(F.col(text_col), n))
    cond = F.array_contains(F.col(helper), F.col("gram"))
    return with_grams.join(grams, cond, how).drop(helper)


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
