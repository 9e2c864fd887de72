"""Condition-recognizer parity with the reference parser (intervals.rs).

F5 fixtures: all 8 orientation orderings parse identically; OR and compound
expressions are rejected (fall back to vanilla join); scrambled right-side
column order exercises name mapping.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sequila_native_spark.operators.condition import (
    overlap_join_on,
    parse_overlap_condition,
)
from tests.conftest import rows_set


@pytest.fixture(scope="module")
def tab_a(spark):
    # intervals.rs:245: a(contig, l_start, l_end)
    return spark.createDataFrame(
        [("c1", 1, 10), ("c1", 20, 30), ("c2", 1, 10)],
        "contig string, l_start int, l_end int",
    )


@pytest.fixture(scope="module")
def tab_b(spark):
    # intervals.rs:246: b with scrambled column order (r_end before r_start)
    return spark.createDataFrame(
        [("c1", "x", 15, 5), ("c1", "y", 40, 25), ("c2", "z", 100, 90)],
        "contig string, name string, r_end int, r_start int",
    )


def _orderings(a, b):
    eq = a["contig"] == b["contig"]
    c1s = [a["l_start"] <= b["r_end"], b["r_end"] >= a["l_start"]]
    c2s = [a["l_end"] >= b["r_start"], b["r_start"] <= a["l_end"]]
    out = []
    for c1 in c1s:
        for c2 in c2s:
            out.append(eq & c1 & c2)
            out.append(eq & c2 & c1)
    return out


def test_all_8_orderings_parse_identically(spark, tab_a, tab_b):
    parses = [parse_overlap_condition(tab_a, tab_b, c) for c in _orderings(tab_a, tab_b)]
    assert all(p is not None for p in parses)
    assert len({(p.left_start, p.left_end, p.right_start, p.right_end, p.on) for p in parses}) == 1
    p = parses[0]
    assert (p.left_start, p.left_end) == ("l_start", "l_end")
    assert (p.right_start, p.right_end) == ("r_start", "r_end")
    assert p.on == (("contig", "contig"),)
    assert not p.strict_less and not p.strict_greater


def test_strict_flags_per_conjunct(spark, tab_a, tab_b):
    c = (
        (tab_a["contig"] == tab_b["contig"])
        & (tab_a["l_start"] < tab_b["r_end"])
        & (tab_a["l_end"] >= tab_b["r_start"])
    )
    p = parse_overlap_condition(tab_a, tab_b, c)
    assert p.strict_less and not p.strict_greater


def test_or_rejected(spark, tab_a, tab_b):
    c = (tab_a["l_start"] <= tab_b["r_end"]) | (tab_a["l_end"] >= tab_b["r_start"])
    assert parse_overlap_condition(tab_a, tab_b, c) is None


def test_compound_expression_rejected(spark, tab_a, tab_b):
    # intervals.rs:507-512: (b.r_end - a.l_start) >= a.l_start must not parse
    c = ((tab_b["r_end"] - tab_a["l_start"]) >= tab_a["l_start"]) & (
        tab_a["l_start"] <= tab_b["r_end"]
    )
    assert parse_overlap_condition(tab_a, tab_b, c) is None


def test_single_range_conjunct_rejected(spark, tab_a, tab_b):
    c = (tab_a["contig"] == tab_b["contig"]) & (tab_a["l_start"] <= tab_b["r_end"])
    assert parse_overlap_condition(tab_a, tab_b, c) is None


def test_overlap_join_on_matches_vanilla(spark, tab_a, tab_b):
    cond = (
        (tab_a["contig"] == tab_b["contig"])
        & (tab_a["l_start"] <= tab_b["r_end"])
        & (tab_a["l_end"] >= tab_b["r_start"])
    )
    vanilla = rows_set(tab_a.join(tab_b, cond, "inner"))
    routed = rows_set(
        overlap_join_on(tab_a, tab_b, cond, algorithm="binning", bin_width=7)
    )
    assert vanilla == routed
    routed_idx = rows_set(overlap_join_on(tab_a, tab_b, cond, algorithm="index"))
    assert vanilla == routed_idx


def test_overlap_join_on_fallback(spark, tab_a, tab_b):
    # unparseable condition still answers (vanilla fallback,
    # sequila_physical_planner.rs:58-64)
    cond = (tab_b["r_end"] - tab_a["l_start"] >= F.lit(0)) & (
        tab_a["l_start"] <= tab_b["r_end"]
    )
    out = overlap_join_on(tab_a, tab_b, cond)
    assert out.count() > 0


def test_mixed_int_widths_cast_unwrapped(spark):
    # pos_start int vs pos_end long forces implicit Casts in the condition
    a = spark.createDataFrame([("c", 1, 10)], "contig string, s int, e long")
    b = spark.createDataFrame([("c", 5, 7)], "contig string, s int, e long")
    cond = (a["contig"] == b["contig"]) & (a["s"] <= b["e"]) & (a["e"] >= b["s"])
    p = parse_overlap_condition(a, b, cond)
    assert p is not None
    assert (p.left_start, p.left_end) == ("s", "e")
