"""Event-stream operators (Structured Streaming).

The reference has no streaming surface (SURVEY.md §2B "not present");
this is north-star extension surface designed Spark-native:

- transformations are written against a plain DataFrame, so the SAME
  function body serves batch tables and ``readStream`` sources — batch
  equivalence is the test strategy (run the transformation both ways on the
  same data, compare);
- aggregations are watermarked so state is bounded under late data;
- sessionization uses ``session_window`` (gap-based), the Spark-native
  replacement for custom stateful operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, *, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over event parquet/json drops with the declared
    schema (streaming sources must never infer)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def hourly_event_aggregates(
    events: DataFrame, *, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1-hour windows per event type: count, integer-scaled value
    sum, distinct-ish user count.

    Works on both batch and streaming frames. On a stream the watermark
    bounds state: windows older than max(event time) − watermark are
    finalized and dropped. ``approx_count_distinct`` is used because exact
    distinct aggregation is unsupported in streaming mode (and at 100 TB an
    exact global distinct per window is a full shuffle anyway).
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("sum_value_cents"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_value_cents",
            "approx_users",
        )
    )


def sessionize(
    events: DataFrame, *, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user sessions: events within ``gap`` of each other merge into one
    session window (Spark-native ``session_window`` — no custom state store
    logic needed).

    Output: user_id, session start/end, n_events, sum_value_cents.
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("win"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("sum_value_cents"),
        )
        .select(
            F.col("user_id"),
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "sum_value_cents",
        )
    )


def correlate_event_streams(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "user_id",
    tolerance_seconds: int = 600,
    watermark: str = "30 minutes",
    left_prefix: str = "a_",
    right_prefix: str = "b_",
) -> DataFrame:
    """Stream-stream inner join: pair events with equal ``key`` where the
    right event lands within ``[0, tolerance_seconds]`` AFTER the left one —
    the funnel/attribution shape (view → purchase, request → error).

    This is the event-time analogue of the interval overlap join, expressed
    as Spark's native watermarked stream-stream join: the condition carries
    both the key equality and a two-sided event-time range, which is exactly
    the contract Structured Streaming needs to bound join state (left rows
    are dropped once the right watermark passes ``ts + tolerance``; right
    rows once the left watermark passes ``ts``). No custom state store —
    the state cleanup is derived from the range condition.

    The same body runs on batch frames (``withWatermark`` is a no-op
    there); batch/stream equivalence is the test strategy, and the batch
    twin is the driver-oracle query.

    Output: ``key, {a,b}_event_id, {a,b}_ts, lag_seconds`` (integer).
    """
    la = left.withWatermark("ts", watermark).alias("__sq_l")
    rb = right.withWatermark("ts", watermark).alias("__sq_r")

    def lcol(c):
        return F.col(f"__sq_l.{c}")

    def rcol(c):
        return F.col(f"__sq_r.{c}")

    cond = (
        (lcol(key) == rcol(key))
        & (rcol("ts") >= lcol("ts"))
        & (
            rcol("ts")
            <= lcol("ts") + F.expr(f"INTERVAL {int(tolerance_seconds)} SECOND")
        )
    )
    return la.join(rb, cond, "inner").select(
        lcol(key).alias(key),
        lcol("event_id").alias(f"{left_prefix}event_id"),
        rcol("event_id").alias(f"{right_prefix}event_id"),
        lcol("ts").alias(f"{left_prefix}ts"),
        rcol("ts").alias(f"{right_prefix}ts"),
        (F.unix_timestamp(rcol("ts")) - F.unix_timestamp(lcol("ts")))
        .cast("bigint")
        .alias("lag_seconds"),
    )


def dedup_events(
    events: DataFrame,
    keys: list[str] | str = "event_id",
    *,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Exactly-once event dedup by key — the streaming face of exact dedup.

    On a stream: ``dropDuplicatesWithinWatermark`` keeps per-key state only
    within the watermark horizon, so state is bounded while duplicates that
    arrive within the horizon (the at-least-once-delivery case: retries,
    replays) are suppressed. On a batch frame the same call degrades to a
    plain ``dropDuplicates`` over the keys — the batch twin used by the
    equivalence test and the driver oracle.

    At 100 TB-stream scale the state store holds one entry per distinct key
    seen inside the horizon — sized by rate x watermark, not by history.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)
