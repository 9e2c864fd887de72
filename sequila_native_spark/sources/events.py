"""Events-table reader: schema drift tolerated, session conf left alone.

The driver's ``events.parquet`` has stored its ``ts`` column two ways over
time: TIMESTAMP(NANOS) (which Spark's vectorized parquet reader rejects
unless ``spark.sql.legacy.parquet.nanosAsLong=true`` maps it to a long) and
native ``timestamp[us]``. :func:`read_events` handles both WITHOUT leaving
session-level side effects for the common (native) case: the nanos flag is
set only around schema resolution and restored immediately; it stays set —
documented below — only when the file genuinely stores nanos, because the
parquet reader consults it again when the scan executes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NANOS_AS_LONG = "spark.sql.legacy.parquet.nanosAsLong"


def normalize_event_ts(ev: DataFrame) -> DataFrame:
    """Bring ``ts`` to TIMESTAMP whichever way the parquet stored it.

    ``bigint`` means the legacy TIMESTAMP(NANOS) encoding surfaced as raw
    nanos via ``nanosAsLong`` — truncate to micros (timestamps are
    micro-precision in Spark). Otherwise a plain cast; with the session
    timezone at UTC the TIMESTAMP_NTZ → TIMESTAMP conversion is an identity.
    """
    ts_type = dict(ev.dtypes).get("ts")
    if ts_type == "bigint":
        return ev.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return ev.withColumn("ts", F.col("ts").cast("timestamp"))


def read_events(spark: SparkSession, path: str) -> DataFrame:
    """Read an events parquet (file or directory) with ``ts: timestamp``.

    The NTZ→TIMESTAMP cast in :func:`normalize_event_ts` is only an identity
    under a UTC session timezone, so UTC is required here. It cannot be
    set-and-restored: the returned frame is lazy, and the cast would execute
    under whatever timezone is live at action time — so a non-UTC session is
    pinned to UTC with a ``UserWarning`` naming the change (engine sessions
    via :func:`sequila_session` already run UTC and are untouched).

    The nanos flag is set/restored around schema resolution; if the file
    actually stores TIMESTAMP(NANOS) the flag must remain ``true`` for the
    scan itself to execute, so in that (legacy-data-only) branch it stays
    set for the session — again with a ``UserWarning``, because it changes
    how later unrelated parquet reads resolve TIMESTAMP(NANOS) columns.
    """
    import warnings

    tz = spark.conf.get("spark.sql.session.timeZone", None)
    if tz != "UTC":
        warnings.warn(
            f"read_events: pinning spark.sql.session.timeZone=UTC for the "
            f"session (was {tz!r}) — the events ts normalization is only "
            f"timezone-independent under UTC, and the lazy scan executes "
            f"under the timezone live at action time",
            UserWarning,
            stacklevel=2,
        )
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    prev = spark.conf.get(NANOS_AS_LONG, None)
    spark.conf.set(NANOS_AS_LONG, "true")
    try:
        ev = spark.read.parquet(path)
        legacy_nanos = dict(ev.dtypes).get("ts") == "bigint"
    except Exception:
        legacy_nanos = False
        raise
    finally:
        if not legacy_nanos:
            if prev is None:
                spark.conf.unset(NANOS_AS_LONG)
            else:
                spark.conf.set(NANOS_AS_LONG, prev)
    if legacy_nanos and prev != "true":
        warnings.warn(
            f"read_events: {path} stores legacy TIMESTAMP(NANOS); "
            f"{NANOS_AS_LONG}=true stays set for this session so the scan "
            f"can execute — later parquet reads will also see TIMESTAMP("
            f"NANOS) columns as BIGINT nanos",
            UserWarning,
            stacklevel=2,
        )
    return normalize_event_ts(ev)
