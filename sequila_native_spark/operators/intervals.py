"""Interval semantics shared by the join operators.

Reference semantics (``src/physical_planner/intervals.rs``):

- Intervals are **closed / end-inclusive**: ``[ls, le]`` overlaps ``[rs, re]``
  iff ``ls <= re AND le >= rs`` (``superintervals/README.md:22``).
- Strict predicates are normalized to inclusive by subtracting 1 from the
  bound — ``a.s < b.e`` ⇒ ``a.s <= b.e - 1`` (``intervals.rs:67-69``, applied
  at ``:99,109,119,129``). Valid for integer coordinates only.
- Bounds are coerced to Int32 at execution time and out-of-range values are a
  **runtime error**, not a silent wrap (``interval_join.rs:1661-1672`` +
  overflow test ``interval_join.rs:1927-1968``).

The reference recognizes the range predicate inside a join filter with an
8-orientation parser (``intervals.rs:76-137``); at our API level the
orientation is fixed by named arguments, so the parser's job reduces to
argument validation (SURVEY.md A4).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

I32_MIN = -(2**31)
I32_MAX = 2**31 - 1


@dataclass(frozen=True)
class IntervalSides:
    """Validated column names for one overlap-join invocation.

    The analogue of the reference's ``ColIntervals`` (``intervals.rs:30-44``),
    which pairs a (start, end) column expression per side. ``on`` holds
    (left_name, right_name) pairs — identical names when the caller passed
    plain strings.
    """

    on: tuple[tuple[str, str], ...]
    left_start: str
    left_end: str
    right_start: str
    right_end: str
    extra_keys: tuple[str, ...] = field(default_factory=tuple)


_INTEGRAL_TYPES = {"tinyint", "smallint", "int", "bigint"}


def validate_sides(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | tuple[str, ...] | str | None,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
) -> IntervalSides:
    """Validate columns exist and bounds are integral.

    Rejecting non-column bound expressions mirrors the reference parser
    rejecting compound expressions like ``(b.e - a.s) >= a.s``
    (``intervals.rs:48,54``, test ``:507-512``) — callers pre-compute such
    expressions into columns instead.
    """
    if on is None:
        keys: tuple[tuple[str, str], ...] = ()
    elif isinstance(on, str):
        keys = ((on, on),)
    else:
        keys = tuple((k, k) if isinstance(k, str) else (k[0], k[1]) for k in on)

    ltypes = dict(left.dtypes)
    rtypes = dict(right.dtypes)
    for lk, rk in keys:
        if lk not in ltypes:
            raise ValueError(f"equi-key column {lk!r} not found on left side")
        if rk not in rtypes:
            raise ValueError(f"equi-key column {rk!r} not found on right side")
    for side, types, cols in (
        ("left", ltypes, (left_start, left_end)),
        ("right", rtypes, (right_start, right_end)),
    ):
        for c in cols:
            if c not in types:
                raise ValueError(f"{side} interval column {c!r} not found")
            if types[c] not in _INTEGRAL_TYPES:
                raise ValueError(
                    f"{side} interval column {c!r} has type {types[c]}; interval "
                    "coordinates must be integral (closed-interval semantics and "
                    "strict-inequality normalization are integer-only, "
                    "intervals.rs:67-69)"
                )
    return IntervalSides(keys, left_start, left_end, right_start, right_end)


def checked_i32(col: Column, name: str) -> Column:
    """Cast a bound to int with the reference's overflow-*error* semantics.

    Vanilla Spark ``cast("int")`` wraps silently; the reference raises
    ``Cast error: Can't cast value 2147483648 to type Int32``
    (``interval_join.rs:1927-1968``). ``raise_error`` keeps the check inside
    whole-stage codegen (no UDF).
    """
    bad = (col < F.lit(I32_MIN)) | (col > F.lit(I32_MAX))
    return (
        F.when(
            bad,
            F.raise_error(
                F.concat(
                    F.lit(f"Cast error: Can't cast value "),
                    col.cast("string"),
                    F.lit(f" to type Int32 (column {name})"),
                )
            ).cast("int"),
        )
        .otherwise(col.cast("int"))
        .alias(name)
    )


def normalize_strict(start: Column, end: Column, strict: bool) -> tuple[Column, Column]:
    """Strict→inclusive normalization (``intervals.rs:67-69``).

    A strict-overlap query ``ls < re AND le > rs`` over integer coordinates
    equals the closed-interval query on ``[ls, le-1]`` vs ``[rs, re-1]``...
    more precisely we shrink each *end* bound by 1 so the single closed
    kernel serves both predicate families.
    """
    if not strict:
        return start, end
    return start, end - F.lit(1)


def overlap_predicate(
    l_start: Column, l_end: Column, r_start: Column, r_end: Column
) -> Column:
    """Closed-interval overlap: ``ls <= re AND le >= rs``."""
    return (l_start <= r_end) & (l_end >= r_start)
