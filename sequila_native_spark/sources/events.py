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
    under a UTC session timezone, so that is pinned here (idempotent for the
    engine's own sessions, which already run UTC). The nanos flag is
    set/restored around schema resolution; if the file actually stores
    TIMESTAMP(NANOS) the flag must remain ``true`` for the scan itself to
    execute, so in that (legacy-data-only) branch it stays set.
    """
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
    return normalize_event_ts(ev)
