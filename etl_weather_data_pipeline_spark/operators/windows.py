"""Window-function operators (SURVEY §2.8 W1 + beyond-reference analytics).

All are single-shuffle plans: one hash partition on the window key, sort
within partitions, no driver-side logic. At 100 TB, skew on the partition
key is the failure mode — callers with hot keys should pre-aggregate or
rely on AQE skew handling (enabled in session.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreak: Sequence[str | Column] = (),
) -> DataFrame:
    """W1 — first row per group by descending ``order_col`` (the reference's
    PostgreSQL ``DISTINCT ON`` view `latest_weather`, sql/schema.sql:100-115).

    row_number (not dropDuplicates) so the winner is deterministic.
    """
    order = [F.col(order_col).desc()] + [
        F.col(c) if isinstance(c, str) else c for c in tiebreak
    ]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def topk_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group with an explicit, deterministic ordering."""
    w = Window.partitionBy(*[F.col(c) for c in keys]).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: int = 30,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the previous
    event of the same user exceeds ``gap_minutes``.

    Classic lag + conditional-sum over one window — a single shuffle on the
    user key; the running sum reuses the same sort, so no second exchange.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in tiebreak]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # unix_timestamp floors to epoch seconds for BOTH timestamp flavors;
    # TIMESTAMP_NTZ (round-4 testdata) has no cast to BIGINT at all. NTZ
    # is interpreted in the session tz — gaps are differences, so this is
    # tz-invariant outside DST transitions (driver sessions run UTC).
    gap_s = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)
    is_new = F.when(
        prev_ts.isNull() | (gap_s > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    running = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn("session_id", F.sum(is_new).over(running))


def running_sum(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str],
    value: Column,
    out_col: str,
) -> DataFrame:
    """Cumulative sum within group (frame: unbounded preceding → current)."""
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(out_col, F.sum(value).over(w))
