"""Batch sinks (SURVEY §2.2 K1-K9).

Parquet is the default store, partitioned by ``date`` — that replaces the
reference's five B-tree indexes (sql/schema.sql:71-77) with partition
pruning, which is the scan-reduction mechanism that actually works at
100 TB.

Upsert (K6): the reference does a per-row INSERT..ON CONFLICT loop
(src/load.py:386-426) — O(n) round-trips. Here it is ONE set-based merge.
Without Delta on the classpath the merge is emulated as
anti-join + union + dynamic-partition overwrite: atomic per partition, and
only the partitions containing updated keys are rewritten. With Delta
available, ``merge_upsert`` dispatches to a real MERGE INTO.
Semantics: whole-row update on key match (SURVEY §7.3 item 4).
"""

from __future__ import annotations

import time
from collections.abc import Sequence
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_weather_data_pipeline_spark.schemas import (
    LOAD_HISTORY_SCHEMA,
    QUALITY_METRICS_SCHEMA,
)

UPSERT_KEYS = ("city", "country", "timestamp")


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K1 — CSV sink with header."""
    df.write.mode(mode).option("header", True).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K2 — JSON-lines sink (ISO timestamps are Spark's default)."""
    df.write.mode(mode).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
) -> None:
    """K3/K4/K5 — parquet append/overwrite, optionally partitioned."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_parquet_sorted(
    df: DataFrame,
    path: str,
    sort_cols: Sequence[str],
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
    num_files: int | None = None,
) -> None:
    """Parquet sink with data-skipping layout: range-partition then sort
    within partitions on ``sort_cols``, so each file and row group covers
    a narrow, mostly disjoint key range. Readers filtering on those
    columns then skip whole row groups via footer min/max stats — the
    poor man's Z-order, and the single biggest scan reducer for selective
    point/range queries after partition pruning. One extra range-exchange
    at write time buys it.

    ``num_files``: explicit output-file count; when omitted, AQE sizes
    the range exchange (and will coalesce small data to few files)."""
    cols = [F.col(c) for c in sort_cols]
    out = (
        df.repartitionByRange(num_files, *cols)
        if num_files
        else df.repartitionByRange(*cols)
    )
    out = out.sortWithinPartitions(*sort_cols)
    w = out.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    partition_by: Sequence[str] = (),
    target_file_mb: int = 128,
) -> dict[str, int]:
    """Small-file compaction — the maintenance op every streaming/upsert
    sink needs: micro-batches and per-partition overwrites accumulate
    files far below the scan-efficient size, and at 100 TB the scheduler
    drowns in file-open overhead before any byte is read.

    Sizes the rewrite from the ACTUAL on-disk bytes (files_before //
    target), repartitions to that count, and overwrites in place — the
    data is localCheckpoint-ed first so the write never re-reads the
    files it replaces (same pattern as merge_upsert). Returns
    {"files_before": n, "files_after": m}.
    """
    import glob
    import os

    def _files() -> list[str]:
        return glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)

    before = _files()
    total_mb = sum(os.path.getsize(f) for f in before) // (1024 * 1024)
    n_out = max(1, int(total_mb // target_file_mb) or 1)
    df = spark.read.parquet(path).localCheckpoint(eager=True)
    if partition_by:
        # One task (-> one file) per hive-partition value.
        df = df.repartition(*[F.col(c) for c in partition_by])
    elif len(before) > n_out:
        df = df.repartition(n_out)
    write_parquet(df, path, "overwrite", partition_by)
    return {"files_before": len(before), "files_after": len(_files())}


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
) -> None:
    """ORC sink — same contract as the parquet sink for warehouses that
    standardize on ORC (both are columnar with predicate pushdown and
    partition pruning; Spark supports them natively)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def _delta_available(spark: SparkSession) -> bool:
    try:
        # Both the Python package and the JVM class must be present; py4j
        # attribute access never raises, so probe with a real classloader
        # lookup.
        from delta.tables import DeltaTable  # noqa: F401

        spark._jvm.java.lang.Class.forName("io.delta.tables.DeltaTable")
        return True
    except Exception:
        return False


def merge_upsert(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    keys: Sequence[str] = UPSERT_KEYS,
    partition_by: Sequence[str] = ("date",),
) -> dict[str, int]:
    """K6 — keyed whole-row upsert into a parquet/Delta table at ``path``.

    Emulated merge plan (no Delta), proportional to the BATCH, not the
    table: read only the partitions the batch touches (semi-join on the
    distinct partition values — at 100 TB a daily batch touches a handful
    of date partitions out of thousands) → anti-join away rows whose key
    collides with the batch → union the batch → ONE dynamic-partition
    overwrite. The output is localCheckpoint-ed first so the write job
    never re-reads the files it is replacing (no staging copy, half the
    I/O of a stage-then-copy plan).

    Contract: every partition column must be functionally dependent on the
    merge key (here date = date(timestamp), timestamp ∈ keys), so a key
    collision can never hide in an untouched partition. Untouched
    partitions are never read, written, or deleted; a crash mid-write can
    leave the touched partitions partial (recoverable by re-running the
    batch — the merge is idempotent) but never drops the rest of the table.
    Returns {"inserted": n, "updated": n}.
    """
    import os

    keys = list(keys)
    parts = list(partition_by)
    if not _delta_available(spark):
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        if os.path.exists(path):
            batch_parts = df.select(*parts).distinct()
            existing = spark.read.parquet(path).join(
                F.broadcast(batch_parts), parts, "left_semi"
            )
            batch_keys = df.select(*keys).distinct()
            updated = (
                existing.join(F.broadcast(batch_keys), keys, "left_semi").count()
            )
            kept = existing.join(F.broadcast(batch_keys), keys, "left_anti")
            out = kept.select(*existing.columns).unionByName(
                df.select(*existing.columns)
            )
            inserted = df.count() - updated
            # Materialize before overwriting the files `kept` reads from.
            out = out.localCheckpoint(eager=True)
            write_parquet(out, path, "overwrite", parts)
            return {"inserted": inserted, "updated": updated}
        write_parquet(df, path, "overwrite", parts)
        return {"inserted": df.count(), "updated": 0}
    # Delta path: real MERGE INTO, whole-row WHEN MATCHED UPDATE SET *.
    from delta.tables import DeltaTable

    if not DeltaTable.isDeltaTable(spark, path):
        df.write.format("delta").partitionBy(*parts).save(path)
        return {"inserted": df.count(), "updated": 0}
    target = DeltaTable.forPath(spark, path)
    cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    (
        target.alias("t")
        .merge(df.alias("s"), cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    return {"inserted": -1, "updated": -1}  # Delta doesn't expose counts here


def append_quality_metrics(
    spark: SparkSession, metrics_row: dict, path: str
) -> None:
    """K7 — append one row to the data_quality_metrics table."""
    row = dict(metrics_row)
    row.setdefault("load_timestamp", datetime.now(timezone.utc).replace(tzinfo=None))
    fields = [f.name for f in QUALITY_METRICS_SCHEMA.fields]
    df = spark.createDataFrame(
        [tuple(row.get(f) for f in fields)], QUALITY_METRICS_SCHEMA
    )
    df.write.mode("append").parquet(path)


def append_load_history(
    spark: SparkSession,
    path: str,
    records_loaded: int,
    records_updated: int = 0,
    records_failed: int = 0,
    duration_s: float = 0.0,
    status: str = "success",
    error_message: str | None = None,
    source_info: str | None = None,
) -> None:
    """K8 — append one row to load_history (written even on failure,
    reference src/load.py:526-554)."""
    df = spark.createDataFrame(
        [
            (
                records_loaded,
                records_updated,
                records_failed,
                duration_s,
                status,
                error_message,
                source_info,
                datetime.now(timezone.utc).replace(tzinfo=None),
            )
        ],
        LOAD_HISTORY_SCHEMA,
    )
    df.write.mode("append").parquet(path)


class Stopwatch:
    """Tiny timer for load_duration_seconds (reference src/load.py:300-301)."""

    def __enter__(self):
        self.t0 = time.monotonic()
        return self

    def __exit__(self, *exc):
        self.seconds = time.monotonic() - self.t0
