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


def pack_documents_intact(
    docs: DataFrame,
    budget: int = 256,
    n_groups: int = 16,
    id_col: str = "doc_id",
    tc_col: str = "n_tokens",
    hash_family: str = "md5",
) -> DataFrame:
    """Greedy intact-document sequence packing (no document is ever
    split — the SFT/packed-finetuning constraint, where concat-then-chunk
    packing like corpus_sequence_pack is forbidden).

    Greedy next-fit is a sequential recurrence (each assignment depends
    on the running fill), so it cannot be a window function — this is
    the textbook case for a grouped ``applyInPandas`` custom operator:
    docs are hash-bucketed into ``n_groups`` deterministic groups, and
    WITHIN each group Python runs next-fit-decreasing over (token count
    desc, id) order. Groups pack in parallel across executors; the
    sequential part is per-group and Arrow-batched. Determinism: group
    assignment is the key hash, in-group order is total, so the packing
    is bit-stable across runs/partitionings. A doc longer than
    ``budget`` gets a sequence of its own (the recurrence opens a fresh
    sequence whenever the doc doesn't fit).

    Input needs a precomputed token-count column (``tc_col``) so the
    Python worker never re-tokenizes text. Returns
    (id, pack_group, seq_id) — seq ids are per-group, dense from 0.

    At 100 TB: n_groups scales with the cluster (it bounds per-task
    state to one group's doc list); the shuffle is one hash partition
    on the group key carrying only (id, token count).
    """
    import pandas as pd  # noqa: F401 — re-imported inside the UDF by value

    grouped = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(tc_col).alias("tc"),
        hash_bucket(F.col(id_col), n_groups, hash_family).alias(
            "pack_group"
        ),
    )

    def pack_group(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            ["tc", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        seqs, fill, seq = [], 0, -1
        for tc in pdf["tc"]:
            if seq < 0 or fill + tc > budget:
                seq += 1
                fill = int(tc)
            else:
                fill += int(tc)
            seqs.append(seq)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "pack_group": pdf["pack_group"],
                "seq_id": seqs,
            }
        )

    return grouped.groupBy("pack_group").applyInPandas(
        pack_group, "doc_id long, pack_group long, seq_id long"
    )
