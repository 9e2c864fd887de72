"""Merge overlapping/adjacent intervals — bedtools ``merge`` semantics.

Flattens each equi-key group's intervals into maximal disjoint runs:
intervals merge when they overlap or are bookended (closed-interval
adjacency: ``[1,5]`` and ``[6,10]`` merge; ``max_gap`` extends this to
bedtools ``-d``). The classic interval-set normalization that precedes
coverage/complement analyses.

Plan shape: one window (running max of ends per key, ordered by start) +
one aggregation on the derived run id — both partitioned on the same keys,
so Catalyst reuses the exchange; no joins, no explosion. At 100 TB this is
a single sort-shuffle per key group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sequila_native_spark.operators.interval_join import _LE, _LS, _with_bounds
from sequila_native_spark.operators.intervals import validate_sides
from sequila_native_spark.session import SequilaConf


def merge_intervals(
    df: DataFrame,
    on: list[str] | str | None = "contig",
    start: str = "pos_start",
    end: str = "pos_end",
    *,
    max_gap: int = 0,
    check_bounds: bool | None = None,
) -> DataFrame:
    """Return one row per merged run: keys, run ``start``/``end``, and
    ``n_merged`` (input intervals absorbed).

    Intervals sharing a key merge when ``next.start <= running_max_end + 1 +
    max_gap`` (closed-interval bookends merge at ``max_gap=0``).
    """
    conf = SequilaConf.from_spark(df.sparkSession)
    check = conf.check_int32_bounds if check_bounds is None else check_bounds
    # reuse two-sided validation with df on both sides (bounds + key checks)
    sides = validate_sides(df, df, on, start, end, start, end)
    keys = [p[0] for p in sides.on]

    b = _with_bounds(df.select(*dict.fromkeys([*keys, start, end])), start, end,
                     _LS, _LE, False, check)
    w_order = Window.partitionBy(*keys).orderBy(F.col(_LS).asc(), F.col(_LE).asc())
    prev_max = F.max(F.col(_LE)).over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_run = F.when(
        prev_max.isNull() | (F.col(_LS) > prev_max + 1 + max_gap), 1
    ).otherwise(0)
    runs = b.withColumn(
        "__sq_run",
        F.sum(new_run).over(
            w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        runs.groupBy(*keys, "__sq_run")
        .agg(
            F.min(_LS).cast("int").alias(start),
            F.max(_LE).cast("int").alias(end),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("__sq_run")
    )
