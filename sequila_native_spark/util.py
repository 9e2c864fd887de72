"""Shared plan utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallel(df: DataFrame, shuffle_cols: list[str] | None = None) -> DataFrame:
    """Repartition a side whose scan has too few splits to use the cluster.

    A single small parquet file (one row group) scans as ONE partition, and
    every downstream narrow op — expression evaluation, explode, broadcast
    probe, mapInPandas — then runs in one task. At real scale scans already
    have many splits and this is a no-op; the check itself costs no job.

    With ``shuffle_cols`` the repartition is hash-keyed (so a following
    equi-join on those columns reuses the exchange); otherwise round-robin.
    """
    if df.isStreaming:
        return df  # no .rdd on streams; micro-batch sizing governs parallelism
    spark = df.sparkSession
    target = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    parallelism = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min(target, parallelism):
        if shuffle_cols:
            return df.repartition(target, *shuffle_cols)
        return df.repartition(target)
    return df


def stamp_row_id(df: DataFrame, col_name: str) -> DataFrame:
    """Attach a per-row id for operators that join a stamped frame against a
    derivative of itself (semi/anti filters, count-join-back, outer padding).

    Uses ``monotonically_increasing_id`` (partition ordinal << 33 | row
    position — no shuffle, no scan). The id must agree between the two plan
    branches that re-evaluate the stamped subtree; that holds when the
    upstream lineage is deterministic in partitioning and row order (file
    scans + narrow ops + hash shuffles — every shape these operators are fed
    in practice). Callers stamping a frame built on nondeterministic sources
    (``rand()``, sampling, unordered ``collect``-reinjection) should
    ``cache()``/``localCheckpoint()`` the input first; the operators
    themselves cannot afford to materialize a 100 TB probe side on the off
    chance.
    """
    from pyspark.sql import functions as F

    return df.withColumn(col_name, F.monotonically_increasing_id())
