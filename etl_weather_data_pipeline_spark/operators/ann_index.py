"""Persisted IVF ANN index store — the 100 TB layout ivf_topk documents.

`operators/similarity.py ivf_topk` prunes an in-memory table by cell; its
docstring prescribes the at-scale layout: "the table is written
partitioned/clustered by cell id, so the probe scan prunes to n_probe
partitions". This module is that layout as a store on disk — the ANN
analogue of the streaming dedup store's `_bands`/`_winnow` side tables
(derived, rebuildable data that persists BETWEEN jobs so the expensive
part — training + assignment — is paid once, not per query):

  write_ivf_index    train a coarse quantizer (deterministic k-means,
                     operators/kmeans.py), assign every vector to its
                     nearest cell, write the vectors partitioned by
                     `cell=` (Hive layout → Catalyst partition pruning),
                     and FREEZE the centroid matrix alongside.
  add_to_ivf_index   incremental path for new vectors: assign against
                     the frozen centroids (map-only codegen argmin, no
                     retraining, no shuffle of existing data) and append
                     into the matching `cell=` partitions.
  ivf_index_topk     probe: nearest n_probe centroids via the SAME
                     selection rule ivf_topk uses
                     (similarity.choose_probe_cells), then scan ONLY
                     those partitions (PartitionFilters — verified
                     against the executed plan and the actual files in
                     tests) and brute-force cosine inside.

Store invariant (checked by the ann_ivf_index_topk driver query): every
row's `cell` equals the argmin over the frozen centroids — regardless of
whether it arrived at build time or through any number of incremental
adds. That makes the index a pure function of (build set, added rows),
so a rebuild is always a safe recovery path: the store carries derived
data only (ids + vectors + cell), never source of truth.

Scale notes (100 TB / 1000 executors): n_cells grows to thousands —
partition count stays equal to n_cells, probe I/O is n_probe/n_cells of
the store. The build writes shuffle once on `cell` so each partition dir
is a few large files, not one file per task; incremental appends add one
file per touched cell per batch — periodic per-partition compaction
(sinks/writers.py compact_parquet) folds them, and because the store is
derived, compaction can always fall back to a full rebuild. Centroids
are k×dim floats — driver-literal scale by design (same bound as
operators/kmeans.py), which is what keeps assignment map-only.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_weather_data_pipeline_spark.operators.kmeans import (
    argmin_index,
    kmeans_fit_full,
)

VECTORS_SUBDIR = "vectors"
CENTROIDS_SUBDIR = "_centroids"  # underscore: hidden from dir discovery
META_FILE = "_IVF_META.json"


def _meta_path(path: str) -> str:
    return os.path.join(path, META_FILE)


def read_ivf_meta(path: str) -> dict:
    with open(_meta_path(path)) as f:
        return json.load(f)


def read_ivf_centroids(spark: SparkSession, path: str) -> DataFrame:
    """(cell, centroid array<double>) — k rows, the frozen quantizer."""
    return spark.read.parquet(f"{path}/{CENTROIDS_SUBDIR}")


def read_ivf_centroid_matrix(
    spark: SparkSession, path: str
) -> list[list[float]]:
    """The frozen quantizer as a k×dim driver literal matrix, ordered by
    cell id — the form :func:`assign_cells` consumes."""
    rows = read_ivf_centroids(spark, path).collect()
    mat = {r["cell"]: [float(x) for x in r["centroid"]] for r in rows}
    return [mat[i] for i in range(len(mat))]


def assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, vec, cell) with cell = codegen'd argmin over the centroid
    literals (operators/kmeans.py argmin_index) — map-only, no shuffle,
    no broadcast; the assignment rule every index row must satisfy.

    Dimension-guarded: a vector whose length differs from the
    quantizer's raises IN-PLAN instead of mis-assigning silently
    (zip_with pads the shorter side with nulls, the distance sums go
    null, and the argmin when-chain would fall through to the LAST
    cell — a wrong index row that no downstream check but the store
    invariant could catch)."""
    dim = len(centroids[0])
    vec = F.col(vec_col)
    guarded = F.when(F.size(vec) == dim, vec).otherwise(
        F.raise_error(
            F.printf(
                F.lit(
                    "ann_index.assign_cells: vector dim %s != "
                    f"quantizer dim {dim}"
                ),
                F.size(vec).cast("string"),
            )
        )
    )
    return df.select(
        F.col(id_col),
        F.col(vec_col),
        argmin_index(guarded, centroids).cast("int").alias("cell"),
    )


def _append_vectors(assigned: DataFrame, path: str, mode: str) -> None:
    # one shuffle on cell → each cell partition dir receives exactly the
    # tasks holding that cell (few large files, never one per input task)
    (
        assigned.repartition("cell")
        .write.mode(mode)
        .partitionBy("cell")
        .parquet(f"{path}/{VECTORS_SUBDIR}")
    )


def write_ivf_index(
    df: DataFrame,
    path: str,
    n_cells: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Build the index: train, assign, write `cell=`-partitioned vectors
    + frozen centroids + a params marker. Returns the meta dict.

    Training is deterministic (kmeans_fit_full: lowest-id seeds, fixed
    iterations), so two builds over the same data produce byte-identical
    assignments — the rebuild-equals-store recovery contract.
    """
    spark = df.sparkSession
    _, _, centroids = kmeans_fit_full(
        df, k=n_cells, iterations=iterations, id_col=id_col,
        vec_col=vec_col,
    )
    assigned = assign_cells(df, centroids, id_col, vec_col)
    _append_vectors(assigned, path, mode="overwrite")
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    )
    cent_df.repartition(1).write.mode("overwrite").parquet(
        f"{path}/{CENTROIDS_SUBDIR}"
    )
    meta = {
        "n_cells": n_cells,
        "dim": len(centroids[0]),
        "id_col": id_col,
        "vec_col": vec_col,
        "metric": "sq_l2_assign/cosine_probe",
    }
    with open(_meta_path(path), "w") as f:
        json.dump(meta, f)
    return meta


def ensure_ivf_index(
    spark: SparkSession,
    path: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> bool:
    """Bootstrap an EMPTY index from an externally trained centroid
    matrix (no vectors written — pair with :func:`add_to_ivf_index`).
    No-op when the index already exists. Returns True if created.

    This is the streaming bootstrap path (streaming/corpus.py semantic
    stage): the first micro-batch trains the quantizer, the index is
    created empty AFTER the batch's admissions are decided, and every
    batch — the first included — appends its survivors through the one
    add path, so the store invariant (cell == argmin over frozen
    centroids) holds by construction."""
    if os.path.exists(_meta_path(path)):
        return False
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    )
    cent_df.repartition(1).write.mode("overwrite").parquet(
        f"{path}/{CENTROIDS_SUBDIR}"
    )
    meta = {
        "n_cells": len(centroids),
        "dim": len(centroids[0]),
        "id_col": id_col,
        "vec_col": vec_col,
        "metric": "sq_l2_assign/cosine_probe",
    }
    with open(_meta_path(path), "w") as f:
        json.dump(meta, f)
    return True


def add_to_ivf_index(df_new: DataFrame, path: str) -> int:
    """Incremental add: assign new vectors against the FROZEN centroids
    (map-only argmin — the store is never read, let alone shuffled) and
    append them into their `cell=` partitions. Returns rows appended.

    The quantizer does not drift: an added vector lands in exactly the
    cell a full rebuild over (old ∪ new) with these centroids would give
    it, so probe semantics are identical before and after. (Re-TRAINING
    on grown data is a separate, explicit rebuild decision — cheap
    because the store is derived.) Like every derived side table here
    (streaming/corpus.py rule), this append is NOT an idempotency
    boundary: the caller dedups its feed; replays double vectors."""
    spark = df_new.sparkSession
    meta = read_ivf_meta(path)
    centroids = read_ivf_centroid_matrix(spark, path)
    assigned = assign_cells(
        df_new, centroids, meta["id_col"], meta["vec_col"]
    ).localCheckpoint()  # count + write from one materialization
    n = assigned.count()
    if n:
        _append_vectors(assigned, path, mode="append")
    return n


def read_ivf_vectors(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(f"{path}/{VECTORS_SUBDIR}")


def compact_ivf_index(
    spark: SparkSession, path: str, target_file_mb: int = 128
) -> dict[str, int]:
    """Fold the per-batch append files inside each `cell=` partition —
    the maintenance op the incremental add path needs: every
    :func:`add_to_ivf_index` leaves one file per touched cell, and at
    streaming cadence the probe's file-open overhead grows linearly
    with batches. Per-partition sizing + staged-swap crash safety come
    from :func:`sinks.writers.compact_parquet` (the rewrite never moves
    a row across cells, so the store invariant is untouched). No-op
    {0,0} when the index has no vectors yet."""
    from etl_weather_data_pipeline_spark.sinks.writers import (
        compact_parquet,
    )

    vdir = f"{path}/{VECTORS_SUBDIR}"
    if not os.path.isdir(vdir):
        return {"files_before": 0, "files_after": 0}
    return compact_parquet(
        spark, vdir, partition_by=("cell",), target_file_mb=target_file_mb
    )


def audit_ivf_coverage(
    spark: SparkSession,
    ids: DataFrame,
    path: str,
    id_col: str = "vec_id",
) -> DataFrame:
    """Ids from ``ids`` that the index is MISSING — the detection tool
    for the documented fail-open gap (a crash between a corpus append
    and the index append, or batches merged with the semantic stage
    off, leave rows the index cannot judge against). The index is not
    rebuildable from a vector-less corpus store, so the remedy is
    re-feeding embeddings for exactly these ids through
    :func:`add_to_ivf_index`; this audit makes the gap a measurable,
    closeable work-list instead of silent recall loss.

    Shape: both sides column-pruned to the id; one anti-join shuffle on
    the key — an offline audit pass, not a per-batch probe. An index
    with no vectors yet reports every input id missing (it is)."""
    meta = read_ivf_meta(path)
    vdir = f"{path}/{VECTORS_SUBDIR}"
    want = ids.select(F.col(id_col).alias(meta["id_col"])).distinct()
    if not os.path.isdir(vdir):
        return want
    have = read_ivf_vectors(spark, path).select(meta["id_col"])
    return want.join(have, meta["id_col"], "left_anti")


def probe_partition_files(path: str, cells: list[int]) -> list[str]:
    """Parquet files inside the given `cell=` partition dirs — the
    footer-level evidence (used by tests and the driver query) that a
    probe's I/O is bounded by its partitions, independent of any plan
    inspection."""
    out: list[str] = []
    root = os.path.join(path, VECTORS_SUBDIR)
    for c in cells:
        d = os.path.join(root, f"cell={c}")
        if os.path.isdir(d):
            out.extend(
                os.path.join(d, f)
                for f in os.listdir(d)
                if f.endswith(".parquet")
            )
    return out


def all_partition_files(path: str) -> list[str]:
    root = os.path.join(path, VECTORS_SUBDIR)
    cells = [
        int(d.split("=", 1)[1])
        for d in os.listdir(root)
        if d.startswith("cell=")
    ]
    return probe_partition_files(path, cells)


def ivf_index_topk(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 3,
) -> DataFrame:
    """Probe the persisted index: top-k cosine among the vectors in the
    n_probe nearest cells. The cell filter hits a Hive partition column,
    so Catalyst prunes the scan to those directories (PartitionFilters)
    — no row outside the probed cells is read, which is the entire point
    of the layout."""
    from etl_weather_data_pipeline_spark.operators.similarity import (
        brute_force_topk,
        choose_probe_cells,
    )

    meta = read_ivf_meta(path)
    cents = read_ivf_centroids(spark, path)
    probe_cells = choose_probe_cells(
        cents, query_vec, n_probe=n_probe, cell_col="cell"
    )
    pruned = read_ivf_vectors(spark, path).filter(
        F.col("cell").isin([int(c) for c in probe_cells])
    )
    return brute_force_topk(
        pruned, query_vec, k, id_col=meta["id_col"], vec_col=meta["vec_col"]
    )
