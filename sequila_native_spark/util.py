"""Shared plan utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

# Analyzed-plan node names that introduce a shuffle or other source of
# row-order nondeterminism on recomputation. Shuffle *fetch order* is
# nondeterministic (reducers merge mapper blocks in arrival order), so any
# post-shuffle frame can present rows in a different order when a plan branch
# re-evaluates it — which breaks positional ids. Python-evaluated stages are
# included because their functions are opaque to us.
_WIDE_MARKERS = (
    "Join",
    "Aggregate",
    "Deduplicate",
    "Window",
    "Sort",
    "Repartition",  # also matches RepartitionByExpression
    "Sample",
    "MapInPandas",
    "MapInArrow",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "rand(",
    "randn(",
    "uuid(",
    "shuffle(",
)


def _has_wide_lineage(df: DataFrame) -> bool:
    """True when the frame's lineage contains a shuffle / nondeterministic
    stage, i.e. positional row ids may disagree across plan branches."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return True  # Connect or API drift: can't inspect — assume the worst
    return any(m in plan for m in _WIDE_MARKERS)


def ensure_parallel(df: DataFrame, shuffle_cols: list[str] | None = None) -> DataFrame:
    """Repartition a side whose scan has too few splits to use the cluster.

    A single small parquet file (one row group) scans as ONE partition, and
    every downstream narrow op — expression evaluation, explode, broadcast
    probe, mapInPandas — then runs in one task. At real scale scans already
    have many splits and this is a no-op; the partition-count probe memoizes
    per (session, analyzed-plan) so repeated operator calls over the same
    frame skip the physical planning it costs.

    With ``shuffle_cols`` the repartition is hash-keyed (so a following
    equi-join on those columns reuses the exchange); otherwise round-robin.
    """
    if df.isStreaming:
        return df  # no .rdd on streams; micro-batch sizing governs parallelism
    spark = df.sparkSession
    target = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    parallelism = spark.sparkContext.defaultParallelism
    key = cache = None
    try:
        key = df._jdf.queryExecution().analyzed().semanticHash()
        cache = _PARTS_CACHE.setdefault(id(spark), {})
    except Exception:
        pass
    if cache is not None and key in cache:
        nparts = cache[key]
    else:
        nparts = df.rdd.getNumPartitions()
        if cache is not None:
            cache[key] = nparts
    if nparts < min(target, parallelism):
        if shuffle_cols:
            return df.repartition(target, *shuffle_cols)
        return df.repartition(target)
    return df


_PARTS_CACHE: dict[int, dict] = {}


def stamp_row_id(df: DataFrame, col_name: str) -> DataFrame:
    """Attach a per-row id for operators that join a stamped frame against a
    derivative of itself (semi/anti filters, count-join-back, outer padding).

    Uses ``monotonically_increasing_id`` (partition ordinal << 33 | row
    position — no shuffle, no scan). The id must agree between the two plan
    branches that re-evaluate the stamped subtree; that holds only when the
    upstream lineage is deterministic in partitioning and row order (file
    scans + narrow ops). When the lineage contains a shuffle, a Python stage,
    or a nondeterministic expression (``rand()``, sampling), row order can
    differ between evaluations — shuffle fetch order is nondeterministic — so
    the stamped frame is pinned with a lazy ``localCheckpoint`` and every
    branch reads the one materialized snapshot instead of recomputing.

    Scale note: the checkpoint persists the stamped frame to executor
    memory+disk, which is exactly what correctness requires (there is no
    cheaper way to make positions stable across a nondeterministic shuffle);
    scan-fed frames — the common case for 100 TB probe sides — skip it.
    """
    from pyspark.sql import functions as F

    stamped = df.withColumn(col_name, F.monotonically_increasing_id())
    if _has_wide_lineage(df):
        try:
            return stamped.localCheckpoint(eager=False)
        except Exception:
            return stamped  # no checkpoint support here (Connect): best effort
    return stamped
