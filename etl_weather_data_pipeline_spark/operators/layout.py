"""Multi-dimensional data layout: Z-order (Morton) bit interleaving.

A table laid out by a single sort key gives narrow per-file min/max
ranges on that key only — predicates on any OTHER column read every
file. Interleaving the bits of two quantized dimensions into one sort
key (the Morton curve) makes file-level ranges narrow in BOTH
dimensions at once, so parquet footer stats prune most files for a
predicate on either column — the idea behind OPTIMIZE ZORDER in the
Delta/Iceberg ecosystems, applied here with nothing but built-in
integer expressions (whole-stage codegen, no UDF).

Two write-path regimes:

- ``zorder_key`` + ``DataFrame.repartitionByRange(n, key)`` +
  ``sortWithinPartitions(key)`` is the 100 TB path: range boundaries
  come from distributed sampling, every task writes one clustered
  file, no global sort. Sampled boundaries are not bit-reproducible
  across runs — fine for a physical layout, which only needs each
  file's range to be NARROW, not identical run-to-run.
- The oracled report query (plans/relational.py events_zorder_layout)
  needs determinism, so it assigns files with ``ntile`` over a full
  (z, id) ordering instead; at scale that report runs on a sample.

The Spark Column and the DuckDB SQL mirror are generated from the same
bit-position loop so the two engines cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of two NON-NEGATIVE
    integer columns: bit i of ``a`` lands at position 2i, bit i of
    ``b`` at 2i+1. Values must fit in ``bits`` bits (callers quantize
    first); negative inputs would put the sign bit in the middle of
    the key and break locality, so quantization must clamp at 0.

    Unrolled at plan-build time into pure shift/mask/or expressions —
    one codegen'd projection, no UDF, no shuffle.
    """
    return zorder_key_multi([a, b], bits)


def zorder_key_multi(cols: list[Column], bits: int = 16) -> Column:
    """Morton-interleave m NON-NEGATIVE integer columns round-robin:
    bit i of column j lands at position i*m + j. Total key width is
    m*bits — callers keep it <= 62 so the key stays a positive long.
    The 2-column :func:`zorder_key` is the (a@even, b@odd) special case
    of the same layout."""
    m = len(cols)
    assert m >= 2, "interleaving needs at least two columns"
    assert m * bits <= 62, f"{m}x{bits}-bit key overflows a long"
    longs = [c.cast("long") for c in cols]
    key: Column | None = None
    for i in range(bits):
        for j, src in enumerate(longs):
            term = F.shiftleft(
                F.shiftright(src, i).bitwiseAND(F.lit(1)), i * m + j
            )
            key = term if key is None else key.bitwiseOR(term)
    return key


def quantize_nonneg(c: Column) -> Column:
    """Standard z-key quantization for arbitrary numeric columns: floor
    to an integer grid and clamp at 0 (negative inputs would put sign
    bits mid-key and destroy locality)."""
    return F.greatest(F.floor(c), F.lit(0)).cast("long")


def o_zorder(a: str, b: str, bits: int = 16) -> str:
    """DuckDB SQL mirror of :func:`zorder_key`, generated from the same
    bit-position loop (same unrolling, same operator semantics)."""
    terms = []
    for i in range(bits):
        for src, pos in ((a, 2 * i), (b, 2 * i + 1)):
            terms.append(
                f"(((CAST({src} AS BIGINT) >> {i}) & 1) << {pos})"
            )
    return "(" + " | ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    key: Column,
    n_files: int,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on ``key``
    (typically a :func:`zorder_key`): range-partition on the key so
    each task owns one contiguous key range, sort within the partition
    so row groups inside a file are clustered too, then write. No
    global sort, no driver bottleneck — boundaries come from Spark's
    distributed range sampling.
    """
    keyed = df.withColumn("__zkey", key)
    (
        keyed.repartitionByRange(n_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
