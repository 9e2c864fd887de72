"""Token-budget curation: keep the best rows until a budget is spent.

The canonical data-curation step of a training pipeline: rank documents by
a priority (model quality score, length, recency), then keep rows in rank
order while the running total of a cost column (token count, bytes) stays
within a budget — per corpus stratum or globally. SQL-wise this is

    SUM(cost) OVER (ORDER BY priority ... ROWS UNBOUNDED PRECEDING) <= B

but a literal global window is a scale-killer: Spark executes an
un-partitioned window on a SINGLE partition, so 100 TB of rows funnel
through one task. :func:`select_within_budget` instead computes the exact
same cumulative sum with a two-level decomposition:

1. bucket each row by a monotone quantization of the priority key (a pure
   projection — consistent with the global order by construction, since
   equal priorities share a bucket and the grid preserves direction);
2. cumulative-sum WITHIN each bucket (``Window.partitionBy(bucket)`` —
   one shuffle, all buckets in parallel);
3. prefix-sum the per-bucket totals (tiny: ``buckets`` rows, so the
   single-partition window there is O(buckets), not O(rows)) and
   broadcast-join the offsets back.

``cum = bucket_offset + within_bucket_cum`` is exactly the global
cumulative sum, with no stage ever holding more than one bucket's rows in
a single task. The per-group variant (``partition_by=``) is the ordinary
partitioned window — already parallel, no decomposition needed.

Exactness contract: with an integer cost column the cumulative sums are
exact in every engine, so the DuckDB twin (:func:`select_within_budget_sql`
— the plain window form) selects the identical row set. Float costs
accumulate rounding differently per engine/plan; keep costs integral
(token counts, bytes) for oracle-grade reproducibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_CUM_DEFAULT = "cum_cost"


def _as_list(v) -> list[str]:
    if v is None:
        return []
    return [v] if isinstance(v, str) else list(v)


def _with_running_cost(
    df: DataFrame,
    cost_col: str,
    order_col: str,
    tiebreak_col: str,
    ascending: bool,
    groups: list[str],
    cum_col: str,
    buckets: int,
    order_bounds: tuple | None,
) -> DataFrame:
    """Append ``cum_col`` = inclusive running sum of ``cost_col`` in
    ``(order_col dir, tiebreak_col)`` order — partitioned window when
    ``groups``, else the two-level bucketed global cumsum (module
    docstring). Shared core of :func:`select_within_budget` and
    :func:`select_top_fraction`."""
    df = df.where(F.col(order_col).isNotNull() & F.col(cost_col).isNotNull())
    okey = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    order = [okey, F.col(tiebreak_col).asc()]

    if groups:
        w = (
            Window.partitionBy(*groups)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.withColumn(cum_col, F.sum(cost_col).over(w))

    b = int(buckets)
    if order_bounds is not None:
        lo, hi = float(order_bounds[0]), float(order_bounds[1])
        if not lo <= hi:
            raise ValueError(f"order_bounds must satisfy lo <= hi, got {order_bounds}")
        base = df.withColumn("__sq_lo", F.lit(lo)).withColumn("__sq_hi", F.lit(hi))
    else:
        # one column-pruned pre-pass; 1-row broadcast, no driver collect
        stats = df.agg(
            F.min(F.col(order_col).cast("double")).alias("__sq_lo"),
            F.max(F.col(order_col).cast("double")).alias("__sq_hi"),
        )
        base = df.crossJoin(F.broadcast(stats))
    span = F.col("__sq_hi") - F.col("__sq_lo")
    raw = F.floor(
        (F.col(order_col).cast("double") - F.col("__sq_lo")) / span * b
    )
    bucket = F.when(span <= F.lit(0.0), F.lit(0)).otherwise(
        F.greatest(F.lit(0), F.least(F.lit(b - 1), raw))
    ).cast("int")
    base = base.withColumn("__sq_bucket", bucket).drop("__sq_lo", "__sq_hi")

    win = (
        Window.partitionBy("__sq_bucket")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = base.withColumn("__sq_cum_in", F.sum(cost_col).over(win))

    # per-bucket totals: <= `buckets` rows, so the un-partitioned prefix
    # window here is O(buckets) — deliberately tiny, never O(rows)
    bkey = F.col("__sq_bucket").asc() if ascending else F.col("__sq_bucket").desc()
    totals = base.groupBy("__sq_bucket").agg(F.sum(cost_col).alias("__sq_tot"))
    offsets = totals.select(
        "__sq_bucket",
        F.coalesce(
            F.sum("__sq_tot").over(
                Window.orderBy(bkey).rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("__sq_off"),
    )
    return (
        within.join(F.broadcast(offsets), "__sq_bucket")
        .withColumn(cum_col, F.col("__sq_cum_in") + F.col("__sq_off"))
        .drop("__sq_bucket", "__sq_cum_in", "__sq_off")
    )


def _check_curation_args(df, cost_col, order_col, tiebreak_col, groups, cum_col, buckets):
    for c in [cost_col, order_col, tiebreak_col, *groups]:
        if c not in df.columns:
            raise ValueError(f"column {c!r} not found in {df.columns}")
    if cum_col in df.columns:
        raise ValueError(f"output column {cum_col!r} already exists")
    if int(buckets) <= 0:
        raise ValueError(f"buckets must be positive, got {buckets}")


def select_within_budget(
    df: DataFrame,
    budget: int,
    cost_col: str,
    order_col: str,
    tiebreak_col: str,
    ascending: bool = False,
    partition_by=None,
    cum_col: str = _CUM_DEFAULT,
    buckets: int = 64,
    order_bounds: tuple | None = None,
) -> DataFrame:
    """Greedy prefix selection under a budget.

    Rows are ordered by ``(order_col, tiebreak_col)`` (descending priority
    by default — "best first"; ``tiebreak_col`` must be unique so the order
    is total and the selection deterministic) and kept while the running
    inclusive sum of ``cost_col`` stays ``<= budget``. Appends ``cum_col``
    (the inclusive cumulative cost) to the surviving rows.

    ``partition_by``: apply the budget independently per group (one
    partitioned-window shuffle). Without it the budget is GLOBAL, computed
    by the two-level bucketed cumulative sum described in the module
    docstring — ``order_col`` must then be numeric (the bucket grid needs
    arithmetic). ``order_bounds=(lo, hi)`` skips the min/max pre-pass when
    the priority range is known (e.g. scores in [0, 1]); bounds only shape
    the buckets, never the result — out-of-range values clamp to the edge
    buckets and the cumulative sums remain exact.

    Rows with a NULL priority or cost are excluded from the selection (a
    NULL cost cannot be budgeted; a NULL priority has no rank).
    Degenerate case: if every row shares one priority value, all rows land
    in one bucket and the global path degrades to a single-partition
    window — same as any engine ordering by a constant.
    """
    if int(budget) < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    groups = _as_list(partition_by)
    _check_curation_args(df, cost_col, order_col, tiebreak_col, groups, cum_col, buckets)
    out = _with_running_cost(
        df, cost_col, order_col, tiebreak_col, ascending, groups,
        cum_col, buckets, order_bounds,
    )
    return out.where(F.col(cum_col) <= F.lit(int(budget)))


def select_top_fraction(
    df: DataFrame,
    fraction: float,
    cost_col: str,
    order_col: str,
    tiebreak_col: str,
    ascending: bool = False,
    partition_by=None,
    cum_col: str = _CUM_DEFAULT,
    buckets: int = 64,
    order_bounds: tuple | None = None,
) -> DataFrame:
    """Keep the best rows covering ``fraction`` of the TOTAL cost — the
    relative form of :func:`select_within_budget` ("top 30% of tokens by
    quality score"), for when the corpus size is not known up front.

    The budget is derived in-plan — ``floor(fraction * sum(cost))``, per
    group with ``partition_by`` else globally — via an aggregate joined
    back (1-row broadcast globally; a per-group aggregate join otherwise),
    so there is still no driver-side collect. Selection then follows the
    same greedy-prefix rule (inclusive running cost <= budget).

    The threshold arithmetic (one IEEE-double multiply + floor on an
    integral total) is engine-reproducible, so the DuckDB twin
    (:func:`select_top_fraction_sql`) selects the identical rows for
    integer costs. ``fraction=0`` selects nothing; ``fraction=1`` keeps
    every non-null row.
    """
    if not (0.0 <= float(fraction) <= 1.0):
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    groups = _as_list(partition_by)
    _check_curation_args(df, cost_col, order_col, tiebreak_col, groups, cum_col, buckets)
    cum = _with_running_cost(
        df, cost_col, order_col, tiebreak_col, ascending, groups,
        cum_col, buckets, order_bounds,
    )
    live = df.where(F.col(order_col).isNotNull() & F.col(cost_col).isNotNull())
    if groups:
        tot = live.groupBy(*groups).agg(F.sum(cost_col).alias("__sq_total"))
        cum = cum.join(tot, groups)
    else:
        tot = live.agg(F.sum(cost_col).alias("__sq_total"))
        cum = cum.crossJoin(F.broadcast(tot))
    thresh = F.floor(F.lit(float(fraction)) * F.col("__sq_total"))
    return cum.where(F.col(cum_col) <= thresh).drop("__sq_total")


def select_within_budget_sql(
    rel: str,
    budget: int,
    cost_expr: str,
    order_expr: str,
    tiebreak_expr: str,
    ascending: bool = False,
    partition_by: str | None = None,
    cum_col: str = _CUM_DEFAULT,
    select: str = "*",
) -> str:
    """DuckDB twin of :func:`select_within_budget`: the plain (partitioned
    or global) cumulative window — small-engine semantics against which the
    two-level decomposition is oracle-checked. Selects ``select`` columns
    plus ``cum_col``."""
    if int(budget) < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    direction = "ASC" if ascending else "DESC"
    part = f"PARTITION BY {partition_by} " if partition_by else ""
    return f"""(
        SELECT {select}, {cum_col} FROM (
            SELECT *, sum({cost_expr}) OVER (
                {part}ORDER BY {order_expr} {direction}, {tiebreak_expr} ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS {cum_col}
            FROM {rel}
            WHERE {order_expr} IS NOT NULL AND {cost_expr} IS NOT NULL
        ) WHERE {cum_col} <= {int(budget)}
    )"""


def select_top_fraction_sql(
    rel: str,
    fraction: float,
    cost_expr: str,
    order_expr: str,
    tiebreak_expr: str,
    ascending: bool = False,
    partition_by: str | None = None,
    cum_col: str = _CUM_DEFAULT,
    select: str = "*",
) -> str:
    """DuckDB twin of :func:`select_top_fraction` (same windows plus the
    same floor(fraction * total) threshold arithmetic)."""
    if not (0.0 <= float(fraction) <= 1.0):
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    direction = "ASC" if ascending else "DESC"
    part = f"PARTITION BY {partition_by} " if partition_by else ""
    total = (
        f"sum({cost_expr}) OVER (PARTITION BY {partition_by})"
        if partition_by else f"sum({cost_expr}) OVER ()"
    )
    return f"""(
        SELECT {select}, {cum_col} FROM (
            SELECT *, sum({cost_expr}) OVER (
                {part}ORDER BY {order_expr} {direction}, {tiebreak_expr} ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS {cum_col},
            floor({float(fraction)!r} * {total}) AS __sq_thresh
            FROM {rel}
            WHERE {order_expr} IS NOT NULL AND {cost_expr} IS NOT NULL
        ) WHERE {cum_col} <= __sq_thresh
    )"""
