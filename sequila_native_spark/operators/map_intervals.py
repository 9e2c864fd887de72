"""Per-interval value aggregation — the bedtools ``map`` verb.

For every LEFT interval, aggregate value column(s) of the overlapping RIGHT
intervals in the same equi-key group: ``sum``/``mean``/``min``/``max``/
``count``/``count_distinct``/``collect``/``distinct`` — the most-used
bedtools verb after intersect/merge. Reference anchor: this is the general
form of the intent behind ``CoitreesCountOverlaps``
(``sequila/sequila-core/src/physical_planner/joins/interval_join.rs:735``,
declared but broken upstream, SURVEY.md §2A A6); ``count_overlaps`` and
``coverage`` are its two special cases, this operator carries an arbitrary
value column.

Scale shape (the 100 TB plan): binned candidate pairs (each overlapping pair
emitted exactly once — no dedup shuffle), optional overlap-fraction
post-filter, then a map-side-combinable ``groupBy(left_row_id).agg(...)``
and a left join back so zero-match rows survive. Two shuffles total —
``(keys…, bin)`` and the left id — both on compact projections: the right
side is pruned to keys + bounds + referenced value columns before the join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sequila_native_spark.operators.interval_join import (
    _LE,
    _LS,
    _RE,
    _RS,
    _binned_pairs,
    _with_bounds,
    resolve_bin_width,
)
from sequila_native_spark.operators.intervals import (
    fraction_predicate,
    overlap_predicate,
    validate_sides,
)
from sequila_native_spark.session import SequilaConf, parse_algorithm
from sequila_native_spark.util import stamp_row_id

_AID = "__sq_map_id"

# op name -> (aggregate builder, null-group default builder). Aggregates
# over the matched pairs; the default fills unmatched left rows after the
# join-back (None = stay null, the bedtools "." convention). Builders are
# thunks: Column construction needs an active session.
_ZERO = lambda: F.lit(0).cast("bigint")  # noqa: E731
_OPS = {
    "count": (lambda c: F.count(F.lit(1)), _ZERO),
    "count_distinct": (lambda c: F.countDistinct(c), _ZERO),
    "sum": (lambda c: F.sum(c), None),
    "min": (lambda c: F.min(c), None),
    "max": (lambda c: F.max(c), None),
    "mean": (lambda c: F.avg(c), None),
    # collect_list order is partition-dependent — sort for deterministic output
    "collect": (lambda c: F.array_sort(F.collect_list(c)), None),
    "distinct": (lambda c: F.array_sort(F.array_distinct(F.collect_list(c))), None),
}


def map_intervals(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str | None = None,
    left_start: str = "pos_start",
    left_end: str = "pos_end",
    right_start: str = "pos_start",
    right_end: str = "pos_end",
    *,
    aggs: dict[str, tuple[str, str | None]],
    strict: bool = False,
    algorithm: str | None = None,
    bin_width: int | str | None = None,
    min_frac_left: float | None = None,
    min_frac_right: float | None = None,
    reciprocal: bool = False,
    either: bool = False,
    check_bounds: bool | None = None,
) -> DataFrame:
    """Return every row of ``left`` plus one aggregate column per ``aggs``
    entry, computed over the overlapping ``right`` rows in its equi-key
    group (bedtools ``map``).

    ``aggs`` maps output column name -> ``(op, right_value_column)`` with
    ``op`` in ``{count, count_distinct, sum, min, max, mean, collect,
    distinct}``; ``count`` takes ``None`` as its value column (it counts
    overlapping rows). Left rows with no overlap keep count-type columns at
    0 and everything else null (bedtools prints ``.``).

    ``min_frac_left`` / ``min_frac_right`` / ``reciprocal`` / ``either``
    restrict which overlaps count (bedtools ``-f/-F/-r/-e``), evaluated on
    the closed input intervals — incompatible with ``strict`` for the same
    reason as in :func:`~sequila_native_spark.overlap_join`.

    ``algorithm``: ``binning`` (default, the scale path) or ``naive`` (the
    oracle predicate join). ``index``/``partitioned`` route to ``binning`` —
    the aggregate already shuffles on the left row id, so a probe-side index
    kernel would not remove a shuffle the way it does for the pure join.
    """
    if not aggs:
        raise ValueError("aggs must name at least one aggregate")
    wants_frac = (
        min_frac_left is not None or min_frac_right is not None
        or reciprocal or either
    )
    if wants_frac and strict:
        raise ValueError(
            "overlap fractions are defined on the closed input intervals; "
            "strict=True would shrink them — not supported together"
        )
    spark = left.sparkSession
    conf = SequilaConf.from_spark(spark)
    algo = parse_algorithm(algorithm) if algorithm else conf.algorithm
    if algo in ("index", "partitioned"):
        algo = "binning"
    width = bin_width if bin_width is not None else conf.bin_width
    check = conf.check_int32_bounds if check_bounds is None else check_bounds

    sides = validate_sides(left, right, on, left_start, left_end, right_start, right_end)
    l_keys = [p[0] for p in sides.on]
    r_keys = [p[1] for p in sides.on]

    # Resolve value columns and build internal aliases so left/right name
    # collisions never reach the joined frame.
    value_cols: dict[str, str] = {}  # right column -> internal alias
    exprs: list[Column] = []
    fills: list[tuple[str, Column | None]] = []
    for out_name, (op, vcol) in aggs.items():
        if op not in _OPS:
            raise ValueError(
                f"unknown map op {op!r} for {out_name!r}; choose from "
                f"{sorted(_OPS)}"
            )
        if out_name in left.columns:
            raise ValueError(f"output column {out_name!r} already exists on left")
        if op == "count":
            if vcol is not None:
                raise ValueError("op 'count' counts overlapping rows; pass None as its column")
        else:
            if vcol is None:
                raise ValueError(f"op {op!r} needs a right-side value column")
            if vcol not in right.columns:
                raise ValueError(f"value column {vcol!r} not found on right side")
            value_cols.setdefault(vcol, f"__sq_mv{len(value_cols)}")
        builder, default = _OPS[op]
        arg = F.col(value_cols[vcol]) if vcol is not None else None
        exprs.append(builder(arg).alias(out_name))
        fills.append((out_name, default))

    left_out_cols = list(left.columns)
    left_stamped = stamp_row_id(left, _AID)
    right_pruned = right.select(
        *dict.fromkeys([*r_keys, right_start, right_end]),
        *[F.col(c).alias(a) for c, a in value_cols.items()],
    )

    lb = _with_bounds(
        left_stamped.select(*dict.fromkeys([*l_keys, left_start, left_end, _AID])),
        left_start, left_end, _LS, _LE, strict, check,
    )
    rb = _with_bounds(right_pruned, right_start, right_end, _RS, _RE, strict, check)

    if algo == "naive":
        cond = overlap_predicate(lb[_LS], lb[_LE], rb[_RS], rb[_RE])
        for lk, rk in zip(l_keys, r_keys):
            cond = (lb[lk] == rb[rk]) & cond
        pairs = lb.join(rb, cond, "inner")
    else:
        width = resolve_bin_width(
            width, lb, left_start, left_end, rb, right_start, right_end
        )
        pairs = _binned_pairs(lb, rb, l_keys, r_keys, width)

    if wants_frac:
        pairs = pairs.where(
            fraction_predicate(
                F.col(_LS), F.col(_LE), F.col(_RS), F.col(_RE),
                min_frac_left=min_frac_left, min_frac_right=min_frac_right,
                reciprocal=reciprocal, either=either,
            )
        )

    grouped = pairs.groupBy(_AID).agg(*exprs)
    out = left_stamped.join(grouped, _AID, "left_outer")
    final_cols = list(left_out_cols)
    for out_name, default in fills:
        if default is not None:
            final_cols.append(F.coalesce(F.col(out_name), default()).alias(out_name))
        else:
            final_cols.append(out_name)
    return out.select(*final_cols)
