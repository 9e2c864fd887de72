"""Join-condition recognizer — the A4/A9 analogue.

The reference recognizes interval joins *after* planning: a physical
optimizer rule parses a HashJoin/NestedLoopJoin filter into
``ColIntervals`` and swaps in ``IntervalJoinExec``
(``sequila_physical_planner.rs:27-101``, parser ``intervals.rs:30-232``).
PySpark cannot inject Catalyst rules, so we recognize the same pattern
*before* planning, on the DataFrame join condition:

- conjuncts are flattened across ``AND`` (``Or`` anywhere ⇒ reject, like
  ``intervals.rs:353-355``);
- each conjunct must compare one plain column of the left frame with one
  plain column of the right frame — compound expressions such as
  ``(b.e - a.s) >= a.s`` are rejected (``intervals.rs:48,54``, test
  ``:507-512``); implicit widening ``Cast``s are unwrapped;
- all 8 orientation orderings of the two range conjuncts normalize to
  ``ls ≤/< re AND le ≥/> rs`` (``intervals.rs:76-137``);
- any remaining ``=`` conjuncts become equi-keys (N keys supported, like
  contig+strand, ``integration_test.rs:374-378``); zero equi-keys is the
  NestedLoopJoin case (A2).

On a successful parse, :func:`overlap_join_on` dispatches to
:func:`~sequila_native_spark.operators.interval_join.overlap_join` with
per-conjunct strictness; otherwise it falls back to the vanilla predicate
join, mirroring the reference's fallback (``sequila_physical_planner.rs:58-64``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame

_CMP = {"<", "<=", ">", ">="}
_FLIP = {"<": ">", ">": "<", "<=": ">=", ">=": "<="}


@dataclass(frozen=True)
class ParsedOverlap:
    """Normalized overlap-join condition (the reference's ``ColIntervals``)."""

    on: tuple[tuple[str, str], ...]
    left_start: str
    left_end: str
    right_start: str
    right_end: str
    strict_less: bool     # ls < re (vs <=)  → shrink the right end by 1
    strict_greater: bool  # le > rs (vs >=)  → shrink the left end by 1


def _attr_ids(df: DataFrame) -> dict[int, str]:
    out = df._jdf.queryExecution().analyzed().output()
    return {out.apply(i).exprId().id(): out.apply(i).name() for i in range(out.size())}


def _flatten_and(node, acc: list) -> bool:
    """Spark 4 Column internals: conditions are ``UnresolvedFunction`` trees
    (fn names ``and``/``or``/``=``/``<``/…) with ``ExpressionColumnNode``
    leaves wrapping resolved catalyst ``AttributeReference``s."""
    cls = node.getClass().getSimpleName()
    if cls == "UnresolvedFunction":
        fn = node.functionName()
        if fn == "and":
            args = node.arguments()
            return all(_flatten_and(args.apply(i), acc) for i in range(args.size()))
        if fn == "or":
            return False
    acc.append(node)
    return True


def _unwrap_attr(node):
    """Return the underlying AttributeReference, or None for anything
    compound (arithmetic, casts of expressions, literals, …)."""
    cls = node.getClass().getSimpleName()
    if cls == "ExpressionColumnNode":
        e = node.expression()
        while e.getClass().getSimpleName() in ("Cast", "AnsiCast"):
            e = e.child()
        if e.getClass().getSimpleName() == "AttributeReference":
            return e
    return None


def parse_overlap_condition(
    left: DataFrame, right: DataFrame, condition: Column
) -> ParsedOverlap | None:
    """Return the normalized pattern, or None when the condition doesn't
    match (caller falls back to a vanilla join)."""
    lids = _attr_ids(left)
    rids = _attr_ids(right)
    conjs: list = []
    if not _flatten_and(condition._jc.node(), conjs):
        return None

    equis: list[tuple[str, str]] = []
    ranges: list[tuple[str, str, str]] = []
    for c in conjs:
        if c.getClass().getSimpleName() != "UnresolvedFunction":
            return None
        fn = c.functionName()
        if fn != "=" and fn not in _CMP:
            return None
        args = c.arguments()
        if args.size() != 2:
            return None
        a = _unwrap_attr(args.apply(0))
        b = _unwrap_attr(args.apply(1))
        if a is None or b is None:
            return None
        aid, bid = a.exprId().id(), b.exprId().id()
        if aid in lids and bid in rids:
            l_name, r_name, op = lids[aid], rids[bid], fn
        elif aid in rids and bid in lids:
            # orient left-frame column first (flip the comparison)
            l_name, r_name, op = lids[bid], rids[aid], _FLIP.get(fn, fn)
        else:
            return None  # both columns from one side, or unknown frame
        if fn == "=":
            equis.append((l_name, r_name))
        else:
            ranges.append((l_name, r_name, op))

    if len(ranges) != 2:
        return None
    less = [t for t in ranges if t[2] in ("<", "<=")]
    greater = [t for t in ranges if t[2] in (">", ">=")]
    if len(less) != 1 or len(greater) != 1:
        return None
    l_start, r_end, lop = less[0]
    l_end, r_start, gop = greater[0]
    return ParsedOverlap(
        on=tuple(equis),
        left_start=l_start,
        left_end=l_end,
        right_start=r_start,
        right_end=r_end,
        strict_less=(lop == "<"),
        strict_greater=(gop == ">"),
    )


def overlap_join_on(
    left: DataFrame,
    right: DataFrame,
    condition: Column,
    **overlap_kwargs,
) -> DataFrame:
    """Join with automatic interval-join detection.

    ``left.join(right, cond)`` drop-in: when ``cond`` matches the
    equi+range pattern the call routes to the configured interval-join
    algorithm; otherwise it falls back to the vanilla Catalyst join —
    exactly the reference rule's behavior, one planning layer earlier.
    Honors ``spark.sequila.preferIntervalJoin=false`` via the conf-driven
    ``naive`` algorithm.
    """
    from sequila_native_spark.operators.interval_join import overlap_join

    parsed = parse_overlap_condition(left, right, condition)
    if parsed is None:
        return left.join(right, condition, "inner")
    return overlap_join(
        left,
        right,
        on=list(parsed.on),
        left_start=parsed.left_start,
        left_end=parsed.left_end,
        right_start=parsed.right_start,
        right_end=parsed.right_end,
        _shrink_left_end=parsed.strict_greater,
        _shrink_right_end=parsed.strict_less,
        **overlap_kwargs,
    )
