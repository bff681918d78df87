"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no stateful streaming (SURVEY §2.10); this is the
beyond-reference surface: an arbitrary per-key accumulator that survives
across micro-batches with timeout-based eviction — the building block for
streaming sessionization, rate tracking, and incremental quality metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_STATS_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("vmin", DoubleType()),
        StructField("vmax", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("vmin", DoubleType()),
        StructField("vmax", DoubleType()),
    ]
)


def running_stats_per_key(
    sdf: DataFrame,
    key_col: str,
    value_col: str,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming running count/sum/min/max per key, state carried across
    micro-batches. Emits one updated row per key per batch.

    ``idle_timeout_ms``: processing-time eviction — a key that receives
    no data for this long has its state DROPPED at the next micro-batch
    (it restarts from zero if seen again). This is what bounds state on
    an unbounded-cardinality key (session ids, doc ids): without it a
    long-running stream accumulates one state entry per distinct key
    forever. ``None`` keeps state indefinitely — only correct for
    bounded key domains (cities, sensors).

    NULL values are ignored entirely: they count toward neither ``n``
    nor the aggregates (a null-heavy batch must not inflate ``n``
    against ``total``, and an all-null batch must not emit ±inf
    bounds). A key that has seen no non-null value yet emits
    ``n=0`` with NULL vmin/vmax.

    The update function is nested so cloudpickle ships it by value
    (executors don't need this package importable).
    """

    def update(key, pdfs, state):
        import pandas as pd  # noqa: PLC0415 — worker-side import

        if state.hasTimedOut:
            # idle eviction: no data for this key this batch, timer
            # expired — drop the state and emit nothing
            state.remove()
            return
        n, total = 0, 0.0
        vmin, vmax = float("inf"), float("-inf")
        if state.exists:
            n, total, vmin, vmax = state.get
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            if len(vals):
                n += int(len(vals))
                total += float(vals.sum())
                vmin = min(vmin, float(vals.min()))
                vmax = max(vmax, float(vals.max()))
        state.update((n, total, vmin, vmax))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            [
                {
                    "key": key[0],
                    "n": n,
                    "total": total,
                    "vmin": vmin if n else None,
                    "vmax": vmax if n else None,
                }
            ]
        )

    return sdf.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=RUNNING_STATS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
