"""Deterministic sampling and dataset splits for training pipelines.

`df.sample` / `sampleBy` draw from a seeded RNG: rows change when the
partitioning, Spark version, or row order changes — useless for a
reproducible train/val/test split over a growing corpus. These operators
derive the decision from a HASH OF THE ROW KEY instead: a document keeps
its split assignment forever, across engines, re-runs, and re-shuffles,
and joining new data never moves old rows between splits.

Default hash family is md5 (any engine reproduces the buckets
bit-for-bit, so the DuckDB oracle can verify them); pass
``hash_family="xxhash64"`` for the production fast path when
cross-engine parity is not required. Everything is a map-only Column
expression — no RNG state, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 1000


def hash_bucket(
    key: Column, buckets: int = BUCKETS, hash_family: str = "md5"
) -> Column:
    """Uniform deterministic bucket in [0, buckets).

    "md5" (default): first 32-bit word of md5(key) mod buckets —
    bit-reproducible in any engine, so the DuckDB oracle can verify
    splits. "xxhash64": pmod(xxhash64(key), buckets) — the production
    fast path (no hex formatting/parsing, ~10x cheaper per key); equally
    stable across runs/partitionings, just a different (Spark-side)
    bucket assignment.
    """
    if hash_family == "xxhash64":
        return F.pmod(F.xxhash64(key.cast("string")), F.lit(buckets))
    assert hash_family == "md5", hash_family
    word = F.conv(
        F.substring(F.md5(key.cast("string")), 1, 8), 16, 10
    ).cast("long")
    return word % buckets


def assign_split(
    key: Column,
    train: float = 0.8,
    val: float = 0.1,
    hash_family: str = "md5",
) -> Column:
    """'train' / 'val' / 'test' label from the key hash. Fractions are in
    thousandths of the bucket space, so train=0.8 is exactly 800/1000."""
    b = hash_bucket(key, hash_family=hash_family)
    return (
        F.when(b < int(train * BUCKETS), "train")
        .when(b < int((train + val) * BUCKETS), "val")
        .otherwise("test")
    )


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, hash_family: str = "md5"
) -> DataFrame:
    """Keep ~fraction of rows, chosen by key hash — stable across runs,
    engines, and partitionings (unlike df.sample)."""
    return df.filter(
        hash_bucket(F.col(key_col), hash_family=hash_family)
        < int(fraction * BUCKETS)
    )


def stratified_take_n(
    df: DataFrame, strata_cols: list[str], n: int, key_col: str
) -> DataFrame:
    """EXACTLY min(n, group size) rows per stratum, deterministically:
    rank rows within each stratum by (md5(key), key) and keep the first n.
    The hash makes the pick pseudo-random yet reproducible; the key
    tiebreak makes it total. One shuffle on the strata columns; Spark
    plans the rank-filter as WindowGroupLimit, so each partition keeps
    only n rows per group before the exchange."""
    from pyspark.sql import Window

    w = Window.partitionBy(*strata_cols).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
