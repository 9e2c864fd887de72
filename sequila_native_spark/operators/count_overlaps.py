"""Count-overlaps — the corrected intent of ``CoitreesCountOverlaps``.

The reference declares a count-overlaps algorithm but its implementation is
incomplete/experimental: the streaming probe keeps only ``temp_matches[0]``
(``interval_join.rs:1268-1279``) while the full path appends all matches
against an RLE count of 1 (``:1593-1607``), desynchronizing the output index
arrays, and it has zero test coverage (SURVEY.md A6). We implement the
*intent* correctly: for each probe (right) row, the number of build (left)
intervals overlapping it within its equi-key group — 0 when none (matching
the declared one-row-per-probe-row contract).

Algorithms:

``binning`` (default, scale path) — binned inner overlap join (each pair
    emitted exactly once) → ``groupBy(probe id).count()`` → left join back to
    the probe so zero-match rows survive. All Catalyst; shuffles on
    ``(keys…, bin)`` then on the probe id.

``index`` — broadcast per-key sorted arrays; ``mapInPandas`` probe computes
    exact counts with two binary searches + a vectorized mask (the
    superintervals ``count`` recipe, ``superintervals/src/
    superintervals.rs:353-446``). Zero shuffle; probe rows stream through
    unchanged with a count column appended.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from sequila_native_spark.operators.interval_join import (
    _LE,
    _LS,
    _RE,
    _RS,
    BuildSideTooLargeError,
    _binned_pairs,
    _probe_spans,
    _with_bounds,
    compact_index_arrays,
    guarded_build_pandas,
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


def count_overlaps(
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
    bin_width: int | None = None,
    count_col: str = "count",
    min_frac_left: float | None = None,
    min_frac_right: float | None = None,
    reciprocal: bool = False,
    either: bool = False,
    check_bounds: bool | None = None,
) -> DataFrame:
    """Return ``right`` with ``count_col`` = number of overlapping ``left``
    intervals in the same equi-key group (0 when none).

    ``min_frac_left`` / ``min_frac_right`` / ``reciprocal`` / ``either``:
    bedtools ``-f/-F/-r/-e`` minimum-overlap-fraction predicates restricting
    which overlaps count — evaluated on the closed input intervals
    (incompatible with ``strict``); the ``index`` algorithm routes to
    ``binning`` when fractions are requested (the count kernel's two binary
    searches answer plain overlap only).
    """
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
    width = bin_width if bin_width is not None else conf.bin_width
    check = conf.check_int32_bounds if check_bounds is None else check_bounds

    sides = validate_sides(left, right, on, left_start, left_end, right_start, right_end)
    if count_col in right.columns:
        raise ValueError(f"count column {count_col!r} already exists on right side")
    # Only the left's key/bound columns are needed — prune before any join.
    l_keys = [p[0] for p in sides.on]
    r_keys = [p[1] for p in sides.on]
    left = left.select(*dict.fromkeys([*l_keys, left_start, left_end]))
    right_out_cols = list(right.columns)
    right_orig = right
    if algo in ("binning", "partitioned"):
        width = resolve_bin_width(
            width, left, left_start, left_end, right, right_start, right_end
        )

    lb = _with_bounds(left, left_start, left_end, _LS, _LE, strict, check)

    if algo == "index" and wants_frac:
        algo = "binning"

    if algo == "index":
        try:
            return _index_count(
                lb, right_orig, l_keys, r_keys, right_start, right_end,
                strict, check, count_col, right_out_cols,
            )
        except BuildSideTooLargeError:
            algo = "binning"  # accounted-memory fallback, never a blind collect

    if algo in ("naive", "binning", "partitioned"):
        right = stamp_row_id(right, _PID)
        rb = _with_bounds(right, right_start, right_end, _RS, _RE, strict, check)
        if algo == "naive":
            cond = overlap_predicate(lb[_LS], lb[_LE], rb[_RS], rb[_RE])
            for lk, rk in zip(l_keys, r_keys):
                cond = (lb[lk] == rb[rk]) & cond
            pairs = rb.join(lb, cond, "inner")
        else:
            pairs = _binned_pairs(lb, rb, l_keys, r_keys, width)
        if wants_frac:
            pairs = pairs.where(
                fraction_predicate(
                    F.col(_LS), F.col(_LE), F.col(_RS), F.col(_RE),
                    min_frac_left=min_frac_left, min_frac_right=min_frac_right,
                    reciprocal=reciprocal, either=either,
                )
            )
        counts = pairs.groupBy(_PID).agg(F.count(F.lit(1)).alias(count_col))
        return (
            right.join(counts, _PID, "left_outer")
            .withColumn(count_col, F.coalesce(F.col(count_col), F.lit(0)))
            .select(*right_out_cols, count_col)
        )

    raise AssertionError(f"unreachable algorithm {algo}")


def _index_count(
    lb, right_orig, l_keys, r_keys, right_start, right_end,
    strict, check, count_col, right_out_cols,
):
    """Broadcast build arrays, streaming vectorized probe, zero shuffle.

    The per-batch count is ``_probe_spans`` (two binary searches + exact
    mask, batch-at-a-time) followed by ``bincount`` over the surviving probe
    positions — the superintervals ``count`` recipe
    (``superintervals.rs:353-446``) without any per-row Python loop.
    """
    rb = _with_bounds(right_orig, right_start, right_end, _RS, _RE, strict, check)
    left_pdf = guarded_build_pandas(lb)
    valid = left_pdf[_LS].notna() & left_pdf[_LE].notna()
    for k in l_keys:
        valid &= left_pdf[k].notna()
    build = left_pdf[valid]
    index: dict[tuple, tuple] = {}
    if len(build):
        group_iter = build.groupby(l_keys, sort=False) if l_keys else [((), build)]
        for key, grp in group_iter:
            if l_keys and not isinstance(key, tuple):
                key = (key,)
            starts = grp[_LS].to_numpy(np.int64)
            ends = grp[_LE].to_numpy(np.int64)
            order = np.argsort(starts, kind="stable")
            starts, ends = starts[order], ends[order]
            index[key] = compact_index_arrays(
                starts, ends, np.maximum.accumulate(ends)
            )

    bc = lb.sparkSession.sparkContext.broadcast(index)
    out_schema = StructType(
        list(right_orig.schema.fields) + [StructField(count_col, LongType(), False)]
    )
    keys = list(r_keys)

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx_map = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            counts_arr = np.zeros(len(pdf), dtype=np.int64)
            qs_all = pdf[_RS].to_numpy(np.int64, na_value=0)
            qe_all = pdf[_RE].to_numpy(np.int64, na_value=0)
            has_null = (pdf[_RS].isna() | pdf[_RE].isna()).to_numpy()
            groups = pdf.groupby(keys, sort=False) if keys else [((), pdf)]
            for key, grp in groups:
                if keys and not isinstance(key, tuple):
                    key = (key,)
                entry = idx_map.get(key)
                if entry is None:
                    continue
                starts, ends, runmax = entry
                pos = pdf.index.get_indexer(grp.index)
                pos = pos[~has_null[pos]]
                if not pos.size:
                    continue
                _, probe_rep = _probe_spans(
                    starts, ends, runmax, qs_all[pos], qe_all[pos]
                )
                if probe_rep.size:
                    counts_arr[pos] = np.bincount(probe_rep, minlength=len(pos))
            out = pdf[right_out_cols].reset_index(drop=True)
            out[count_col] = counts_arr
            yield out

    return rb.mapInPandas(probe, schema=out_schema).select(*right_out_cols, count_col)
