"""Semi/anti overlap filtering — bedtools ``intersect -u`` / ``-v``.

The reference's join-type enum declares Semi/Anti
(``joins/utils.rs:496-521``) but its probe loop never implements their
emission (SURVEY.md §2A note); this operator supplies the semantics the
declaration promises, as the two most common interval-filter shapes:

- ``filter_by_overlap(df, regions)`` — keep rows of ``df`` whose interval
  overlaps at least one region (semi join);
- ``negate=True`` — keep rows overlapping NO region (anti join; blacklist
  subtraction);
- ``mark_by_overlap(df, regions)`` — keep ALL rows, adding a boolean mark
  column (the enum's LeftMark / ``EXISTS``-subquery shape).

Scale shape: binned candidate join → distinct probe ids → Catalyst
left-semi/left-anti join back. The pair set is never materialized wider
than (id, id); at 100 TB this is two compact shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
from sequila_native_spark.util import stamp_row_id
from sequila_native_spark.operators.intervals import (
    fraction_predicate,
    overlap_predicate,
    validate_sides,
)
from sequila_native_spark.session import SequilaConf, parse_algorithm

_PID = "__sq_probe_id"


def filter_by_overlap(
    df: DataFrame,
    regions: DataFrame,
    on: list[str] | str | None = None,
    df_start: str = "pos_start",
    df_end: str = "pos_end",
    regions_start: str = "pos_start",
    regions_end: str = "pos_end",
    *,
    negate: bool = False,
    strict: bool = False,
    algorithm: str | None = None,
    bin_width: int | str | None = None,
    min_frac_df: float | None = None,
    min_frac_regions: float | None = None,
    reciprocal: bool = False,
    either: bool = False,
    check_bounds: bool | None = None,
) -> DataFrame:
    """Keep rows of ``df`` that overlap ≥1 ``regions`` interval in their
    equi-key group (``negate=True``: keep rows overlapping none).

    Returns ``df``'s rows unchanged (schema preserved, duplicates kept).

    ``min_frac_df`` / ``min_frac_regions`` / ``reciprocal`` / ``either``:
    bedtools ``-f/-F/-r/-e`` — an overlap only qualifies when it covers at
    least the given fraction of the ``df`` row's interval (``-f``) and/or of
    the region (``-F``); ``reciprocal`` applies ``min_frac_df`` to both
    sides, ``either`` ORs the given fractions. Evaluated on the closed
    input intervals (incompatible with ``strict``). With ``negate=True``
    this is bedtools ``-v -f``: keep rows with NO qualifying overlap.
    """
    probe, matched_ids, out_cols = _probe_and_matched(
        df, regions, on, df_start, df_end, regions_start, regions_end,
        strict=strict, algorithm=algorithm, bin_width=bin_width,
        min_frac_df=min_frac_df, min_frac_regions=min_frac_regions,
        reciprocal=reciprocal, either=either,
        check_bounds=check_bounds,
    )
    how = "left_anti" if negate else "left_semi"
    return probe.join(matched_ids, _PID, how).select(*out_cols)


def mark_by_overlap(
    df: DataFrame,
    regions: DataFrame,
    on: list[str] | str | None = None,
    df_start: str = "pos_start",
    df_end: str = "pos_end",
    regions_start: str = "pos_start",
    regions_end: str = "pos_end",
    *,
    mark_col: str = "has_overlap",
    strict: bool = False,
    algorithm: str | None = None,
    bin_width: int | str | None = None,
    min_frac_df: float | None = None,
    min_frac_regions: float | None = None,
    reciprocal: bool = False,
    either: bool = False,
    check_bounds: bool | None = None,
) -> DataFrame:
    """Keep ALL rows of ``df``, adding boolean ``mark_col`` = "this row
    overlaps ≥1 ``regions`` interval in its equi-key group".

    The reference's join-type enum declares a Mark join
    (``joins/utils.rs:496-521``, DataFusion's ``EXISTS``-subquery
    decorrelation shape) that its probe loop never emits; this supplies it.
    Same scale shape as the semi/anti filters: the wide pair set is never
    materialized — only (id) survives the candidate join, and the mark is a
    left join against the distinct matched ids.
    """
    if mark_col in df.columns:
        raise ValueError(f"output column {mark_col!r} already exists on df")
    probe, matched_ids, out_cols = _probe_and_matched(
        df, regions, on, df_start, df_end, regions_start, regions_end,
        strict=strict, algorithm=algorithm, bin_width=bin_width,
        min_frac_df=min_frac_df, min_frac_regions=min_frac_regions,
        reciprocal=reciprocal, either=either,
        check_bounds=check_bounds,
    )
    marked = probe.join(
        matched_ids.withColumn(mark_col, F.lit(True)), _PID, "left"
    )
    return marked.select(
        *out_cols, F.coalesce(F.col(mark_col), F.lit(False)).alias(mark_col)
    )


def _probe_and_matched(
    df: DataFrame,
    regions: DataFrame,
    on,
    df_start: str,
    df_end: str,
    regions_start: str,
    regions_end: str,
    *,
    strict: bool,
    algorithm: str | None,
    bin_width: int | str | None,
    min_frac_df: float | None = None,
    min_frac_regions: float | None = None,
    reciprocal: bool = False,
    either: bool = False,
    check_bounds: bool | None,
):
    """Shared semi/anti/mark machinery: stamp probe ids, build the binned
    (or naive) candidate pair set, reduce it to the distinct matched ids."""
    wants_frac = (
        min_frac_df is not None or min_frac_regions is not None
        or reciprocal or either
    )
    if wants_frac and strict:
        raise ValueError(
            "overlap fractions are defined on the closed input intervals; "
            "strict=True would shrink them — not supported together"
        )
    if reciprocal:
        if min_frac_df is None:
            raise ValueError("reciprocal=True requires min_frac_df (bedtools -r needs -f)")
        if min_frac_regions is not None:
            raise ValueError(
                "reciprocal=True derives the region fraction from min_frac_df; "
                "do not also pass min_frac_regions"
            )
        min_frac_regions = min_frac_df
    spark = df.sparkSession
    conf = SequilaConf.from_spark(spark)
    algo = parse_algorithm(algorithm) if algorithm else conf.algorithm
    width = bin_width if bin_width is not None else conf.bin_width
    check = conf.check_int32_bounds if check_bounds is None else check_bounds

    # validate with df as the probe (right) side, regions as build (left)
    sides = validate_sides(
        regions, df, on, regions_start, regions_end, df_start, df_end
    )
    l_keys = [p[0] for p in sides.on]
    r_keys = [p[1] for p in sides.on]
    regions = regions.select(
        *dict.fromkeys([*l_keys, regions_start, regions_end])
    )
    out_cols = list(df.columns)
    if algo != "naive":
        width = resolve_bin_width(
            width, regions, regions_start, regions_end, df, df_start, df_end
        )

    lb = _with_bounds(regions, regions_start, regions_end, _LS, _LE, strict, check)
    probe = stamp_row_id(df, _PID)
    rb = _with_bounds(probe, df_start, df_end, _RS, _RE, strict, check)

    if algo == "naive":
        cond = overlap_predicate(lb[_LS], lb[_LE], rb[_RS], rb[_RE])
        for lk, rk in zip(l_keys, r_keys):
            cond = (lb[lk] == rb[rk]) & cond
        pairs = rb.join(lb, cond, "inner")
    else:
        pairs = _binned_pairs(lb, rb, l_keys, r_keys, width)

    if wants_frac:
        # regions are the build/left side here, df the probe/right side
        pairs = pairs.where(
            fraction_predicate(
                F.col(_LS), F.col(_LE), F.col(_RS), F.col(_RE),
                min_frac_left=min_frac_regions, min_frac_right=min_frac_df,
                either=either,
            )
        )

    matched_ids = pairs.select(_PID).distinct()
    return probe, matched_ids, out_cols
