"""Per-interval coverage — the A12 ``coverage`` kernel as an operator.

The vendored superintervals library exposes ``coverage(start, end) ->
(count, Σ min(endᵢ,end) − max(startᵢ,start))`` (``superintervals/src/
superintervals.rs:802-822``): the number of overlapping build intervals and
the total clipped overlap. We expose that per probe row, with one
deliberate divergence: closed-interval base counting adds ``+1`` per
overlap (``min(le,qe) − max(ls,qs) + 1``), so a read exactly covering a
1-base target contributes 1 covered base, consistent with the engine's
end-inclusive semantics (the reference's length omits the +1).

Note this is *aligned-base depth* (overlapping build intervals each
contribute their clipped length — bases under two reads count twice), the
standard depth-of-coverage numerator. Union coverage (distinct covered
bases) is a different operator.

Scale shape: identical to count_overlaps — binned candidate join, partial
aggregation on the probe id, left join back so zero-coverage rows survive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sequila_native_spark.operators.interval_join import (
    _LE,
    _LS,
    _RE,
    _RS,
    _binned_pairs,
    _with_bounds,
)
from sequila_native_spark.operators.intervals import overlap_predicate, validate_sides
from sequila_native_spark.session import SequilaConf, parse_algorithm
from sequila_native_spark.util import stamp_row_id

_PID = "__sq_probe_id"


def coverage(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str | None = None,
    left_start: str = "pos_start",
    left_end: str = "pos_end",
    right_start: str = "pos_start",
    right_end: str = "pos_end",
    *,
    strict: bool = False,
    algorithm: str | None = None,
    bin_width: int | str | None = None,
    count_col: str = "n_overlaps",
    cover_col: str = "bases_covered",
    check_bounds: bool | None = None,
) -> DataFrame:
    """Return ``right`` with overlap count and total clipped overlap length
    against ``left`` within each equi-key group (0/0 when none)."""
    spark = left.sparkSession
    conf = SequilaConf.from_spark(spark)
    algo = parse_algorithm(algorithm) if algorithm else conf.algorithm
    width = bin_width if bin_width is not None else conf.bin_width
    check = conf.check_int32_bounds if check_bounds is None else check_bounds

    sides = validate_sides(left, right, on, left_start, left_end, right_start, right_end)
    for c in (count_col, cover_col):
        if c in right.columns:
            raise ValueError(f"output column {c!r} already exists on right side")
    l_keys = [p[0] for p in sides.on]
    r_keys = [p[1] for p in sides.on]
    left = left.select(*dict.fromkeys([*l_keys, left_start, left_end]))
    right_out_cols = list(right.columns)

    lb = _with_bounds(left, left_start, left_end, _LS, _LE, strict, check)
    right = stamp_row_id(right, _PID)
    rb = _with_bounds(right, right_start, right_end, _RS, _RE, strict, check)

    if algo in ("naive",):
        cond = overlap_predicate(lb[_LS], lb[_LE], rb[_RS], rb[_RE])
        for lk, rk in zip(l_keys, r_keys):
            cond = (lb[lk] == rb[rk]) & cond
        pairs = rb.join(lb, cond, "inner")
    else:
        pairs = _binned_pairs(lb, rb, l_keys, r_keys, width)

    clipped = (
        F.least(F.col(_LE), F.col(_RE)) - F.greatest(F.col(_LS), F.col(_RS)) + 1
    ).cast("bigint")
    aggs = pairs.groupBy(_PID).agg(
        F.count(F.lit(1)).alias(count_col),
        F.sum(clipped).alias(cover_col),
    )
    return (
        right.join(aggs, _PID, "left_outer")
        .withColumn(count_col, F.coalesce(F.col(count_col), F.lit(0)))
        .withColumn(cover_col, F.coalesce(F.col(cover_col), F.lit(0)))
        .select(*right_out_cols, count_col, cover_col)
    )


def union_coverage(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str | None = None,
    left_start: str = "pos_start",
    left_end: str = "pos_end",
    right_start: str = "pos_start",
    right_end: str = "pos_end",
    *,
    strict: bool = False,
    bin_width: int | str | None = None,
    cover_col: str = "bases_union",
    check_bounds: bool | None = None,
) -> DataFrame:
    """Distinct covered bases per probe interval (breadth of coverage).

    Unlike :func:`coverage` (aligned-base depth, double-counts overlapping
    build intervals), this computes the size of the UNION of intersections —
    the classic merged-interval sweep, expressed as a window: clip each
    overlap to the probe, order by clipped start within the probe, and count
    only bases past the running max of previous clipped ends. One window +
    one aggregation, both partitioned on the probe id (exchange reused).
    """
    spark = left.sparkSession
    conf = SequilaConf.from_spark(spark)
    width = bin_width if bin_width is not None else conf.bin_width
    check = conf.check_int32_bounds if check_bounds is None else check_bounds

    sides = validate_sides(left, right, on, left_start, left_end, right_start, right_end)
    if cover_col in right.columns:
        raise ValueError(f"output column {cover_col!r} already exists on right side")
    l_keys = [p[0] for p in sides.on]
    r_keys = [p[1] for p in sides.on]
    left = left.select(*dict.fromkeys([*l_keys, left_start, left_end]))
    right_out_cols = list(right.columns)

    lb = _with_bounds(left, left_start, left_end, _LS, _LE, strict, check)
    right = stamp_row_id(right, _PID)
    rb = _with_bounds(right, right_start, right_end, _RS, _RE, strict, check)

    pairs = _binned_pairs(lb, rb, l_keys, r_keys, width)
    cs = F.greatest(F.col(_LS), F.col(_RS))
    ce = F.least(F.col(_LE), F.col(_RE))
    w = (
        Window.partitionBy(_PID)
        .orderBy(cs.asc(), ce.asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max(ce).over(w)
    new_bases = F.greatest(
        F.lit(0).cast("bigint"),
        (ce - F.greatest(cs - 1, F.coalesce(prev_max, cs - 1))).cast("bigint"),
    )
    aggs = (
        pairs.withColumn("__sq_new", new_bases)
        .groupBy(_PID)
        .agg(F.sum("__sq_new").alias(cover_col))
    )
    return (
        right.join(aggs, _PID, "left_outer")
        .withColumn(cover_col, F.coalesce(F.col(cover_col), F.lit(0)))
        .select(*right_out_cols, cover_col)
    )
