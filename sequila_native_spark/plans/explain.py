"""Physical-plan assertions — the EXPLAIN-based test surface.

The reference asserts via EXPLAIN which exec actually ran
(``integration_test.rs:102-112``: the test matrix checks ``IntervalJoinExec``
vs ``HashJoinExec`` appears in the plan). Our analogue: assert that the
binning path planned an equi-join (not a nested loop), that filters reached
the parquet scan (``PushedFilters``), and that column pruning held
(``ReadSchema``) — the properties that matter at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan — the column-pruning witness."""
    return re.findall(r"ReadSchema: (struct<[^\n]*>)", formatted_plan(df))


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_sort_merge_or_hash_join(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return any(
        j in plan for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )


def has_nested_loop_join(df: DataFrame) -> bool:
    """True for any quadratic join strategy (BNLJ or CartesianProduct)."""
    plan = formatted_plan(df)
    return "NestedLoopJoin" in plan or "CartesianProduct" in plan


def wholestage_codegen_ids(df: DataFrame) -> list[str]:
    """WholeStageCodegen span ids — wider/more spans ⇒ more of the plan is
    compiled instead of interpreted."""
    return re.findall(r"WholeStageCodegen \(([0-9]+)\)", formatted_plan(df))
