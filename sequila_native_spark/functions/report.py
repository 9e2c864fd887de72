"""Corpus report — the "data card" summary a curation pipeline publishes
with a training set: sizes, token/char totals, and EXACT distribution
percentiles, all integers.

Exactness at scale: naive exact percentiles sort or collect the value
column. Document LENGTHS have a tiny domain (distinct values ≪ rows), so
the percentile is computed from the length HISTOGRAM instead — one
map-side-combinable ``groupBy(length)``, then a cumulative sum over the
(small) histogram and a rank lookup. ``percentile_disc`` semantics: the
smallest value whose cumulative distribution reaches ``p`` (1-based rank
``ceil(n·p)``) — integer in, integer out, so the whole report is
hash-comparable across engines (the DuckDB twin in the tests spells out
the same cumsum, no reliance on engine-specific quantile interpolation).
NULL text is excluded from the distributions (SQL aggregate convention).

Output is melt-form ``(metric string, value bigint)`` — one schema for any
metric set, unionable across groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PCTS = (50, 90, 99)


def _disc_percentiles(df: DataFrame, col, prefix: str) -> DataFrame:
    """(metric, value) rows: exact percentile_disc of an integer expression
    via the histogram-cumsum rank lookup.

    percentile_disc(p) = the smallest value whose cumulative distribution
    reaches p, i.e. the value at 1-based rank ``ceil(n·p)`` in sorted
    order. NULL inputs are excluded (SQL aggregate convention — both
    engines' null orderings differ, so including them would also break the
    twin parity); an empty input yields the three metric rows with NULL
    values (matching the twin's scalar subqueries)."""
    hist = (
        df.select(col.cast("bigint").alias("__v"))
        .where(F.col("__v").isNotNull())
        .groupBy("__v")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select("__v", F.sum("__c").over(w).alias("__cum"))
    n = hist.agg(F.sum("__c").alias("n"))
    ranks = n.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(f"{prefix}_p{p}").alias("metric"),
                    F.ceil(F.col("n") * F.lit(p / 100.0))
                    .cast("bigint")
                    .alias("__r"),
                )
                for p in _PCTS
            ])
        ).alias("s")
    ).select("s.metric", "s.__r")
    # value = min __v with cum >= rank; the join is (3 ranks) x (histogram).
    # LEFT join so an empty/all-null input still emits the metric rows
    # (with NULL), exactly like the twin's scalar subselects.
    return (
        ranks.join(cum, cum["__cum"] >= ranks["__r"], "left")
        .groupBy("metric")
        .agg(F.min("__v").alias("value"))
    )


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The corpus data card: ``(metric string, value bigint)`` rows —

    - ``n_docs``, ``n_distinct_ids`` (equal unless ids collide)
    - ``n_words`` (whitespace tokens), ``n_chars`` (sum of lengths)
    - ``chars_p50/p90/p99``, ``words_p50/p90/p99`` (exact, disc semantics)

    Plans: two map-side-combinable aggregations (totals + the two
    histograms) over one scan's projections; the only ordered work is the
    cumsum over histograms whose size is the number of DISTINCT lengths.
    """
    words = F.size(F.split(F.lower(F.col(text_col)), " "))
    chars = F.length(F.col(text_col))
    totals = df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.col(id_col)).alias("n_distinct_ids"),
        F.sum(words.cast("bigint")).alias("n_words"),
        F.sum(chars.cast("bigint")).alias("n_chars"),
    )
    melted = totals.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(m).alias("metric"),
                         F.col(m).cast("bigint").alias("value"))
                for m in ("n_docs", "n_distinct_ids", "n_words", "n_chars")
            ])
        ).alias("s")
    ).select("s.metric", "s.value")
    return (
        melted
        .unionByName(_disc_percentiles(df, chars, "chars"))
        .unionByName(_disc_percentiles(df, words, "words"))
    )


def corpus_report_sql(table: str = "documents", text_col: str = "text",
                      id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`corpus_report` — the same histogram-cumsum
    rank lookup spelled out in SQL (no engine quantile function, so the
    semantics are identical by construction)."""
    words = f"len(string_split(lower({text_col}), ' '))"
    chars = f"length({text_col})"

    def pct_cte(expr: str, prefix: str) -> str:
        return f"""
        {prefix}_hist AS (
            SELECT CAST({expr} AS BIGINT) AS v, count(*) AS c
            FROM {table} WHERE CAST({expr} AS BIGINT) IS NOT NULL GROUP BY 1
        ),
        {prefix}_cum AS (
            SELECT v, sum(c) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM {prefix}_hist
        ),
        {prefix}_n AS (SELECT sum(c) AS n FROM {prefix}_hist),
        {prefix}_pct AS (
            SELECT '{prefix}_p' || p AS metric,
                   (SELECT min(v) FROM {prefix}_cum
                    WHERE cum >= CAST(ceil(n * p / 100.0) AS BIGINT)
                   ) AS value
            FROM {prefix}_n, (VALUES (50), (90), (99)) AS pp(p)
        )"""

    return f"""
        WITH {pct_cte(chars, 'chars')},
        {pct_cte(words, 'words')},
        tot AS (
            SELECT count(*) AS n_docs,
                   count(DISTINCT {id_col}) AS n_distinct_ids,
                   sum(CAST({words} AS BIGINT)) AS n_words,
                   sum(CAST({chars} AS BIGINT)) AS n_chars
            FROM {table}
        )
        SELECT 'n_docs' AS metric, CAST(n_docs AS BIGINT) AS value FROM tot
        UNION ALL SELECT 'n_distinct_ids', CAST(n_distinct_ids AS BIGINT) FROM tot
        UNION ALL SELECT 'n_words', CAST(n_words AS BIGINT) FROM tot
        UNION ALL SELECT 'n_chars', CAST(n_chars AS BIGINT) FROM tot
        UNION ALL SELECT metric, CAST(value AS BIGINT) FROM chars_pct
        UNION ALL SELECT metric, CAST(value AS BIGINT) FROM words_pct
    """
