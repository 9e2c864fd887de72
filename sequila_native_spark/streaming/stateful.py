"""Custom stateful streaming operator (``applyInPandasWithState``).

``session_window``/windowed aggs cover aggregation shapes; this module covers
the shape they can't: **per-event emission with evolving per-key state**.
``running_user_totals`` stamps every event with its per-user ordinal and
running value total — the building block for rate limiting, burn-down
counters, and training-data stream accounting.

Batch/stream equivalence is the contract (and the test): on a batch frame
the same function is a window expression (SQL-oracle-able); on a stream it
is an ``applyInPandasWithState`` state machine. With in-order arrival the
two agree exactly; under out-of-order arrival across micro-batches the
streaming ordinals follow arrival order (standard streaming semantics —
a total event-time order would need infinite latency).

State is one ``(n_events, run_cents)`` pair per user — O(distinct keys)
and constant per key. Production deployments should expire idle keys with
an event-time timeout; kept ``NoTimeout`` here so batch equivalence is
exact for the test fixture.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("cents", LongType())]
)


def _out_schema(events: DataFrame) -> StructType:
    return StructType(
        list(events.schema.fields)
        + [
            StructField("ordinal", LongType(), False),
            StructField("run_cents", LongType(), True),
        ]
    )


def running_user_totals(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stamp each event with ``ordinal`` (1-based per-key arrival rank) and
    ``run_cents`` (running ``floor(value*100)`` total, integer — no float
    drift across engines).

    Batch: window expression over ``(ts, id)`` order. Stream: per-key state
    via ``applyInPandasWithState`` (micro-batch rows sorted by the same
    ``(ts, id)`` key before the state update, so single-batch runs equal the
    batch twin exactly).
    """
    cents = F.floor(F.col(value_col) * 100).cast("bigint")
    if not events.isStreaming:
        w = (
            Window.partitionBy(key_col)
            .orderBy(ts_col, id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            events.withColumn("__sq_cents", cents)
            .withColumn(
                "ordinal", F.row_number().over(Window.partitionBy(key_col).orderBy(ts_col, id_col)).cast("bigint")
            )
            .withColumn("run_cents", F.sum("__sq_cents").over(w))
            .drop("__sq_cents")
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = _out_schema(events)
    out_cols = [f.name for f in out_schema.fields]

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, run_cents = state.get if state.exists else (0, 0)
        batch = pd.concat(list(pdfs), ignore_index=True)
        if not len(batch):
            return
        batch = batch.sort_values([ts_col, id_col], kind="stable").reset_index(
            drop=True
        )
        c = (
            (batch[value_col] * 100)
            .map(lambda v: int(v // 1) if pd.notna(v) else 0)
            .astype("int64")
        )
        batch["ordinal"] = n + 1 + pd.RangeIndex(len(batch))
        batch["run_cents"] = run_cents + c.cumsum()
        state.update((int(batch["ordinal"].iloc[-1]), int(batch["run_cents"].iloc[-1])))
        yield batch[out_cols]

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            out_schema,
            _STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
