"""Iterative k-means over an embedding column — pure DataFrame ops.

The representative of the iterative-algorithm class (SURVEY §7.2 M6):
driver-side loop, cluster assignment as a codegen'd argmin over literal
centroids (broadcast-free — centroids travel inside the plan), centroid
update as posexplode + partial+final mean. Each iteration is one shuffle
of (n_rows × dim) exploded values; no data ever collects to the driver
except the k×dim centroid matrix itself.

Deterministic: centroids seed from the k lowest ids; ties in argmin break
toward the lower cluster index.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_weather_data_pipeline_spark.functions.vector import (
    double_array,
    double_matrix,
)


def _sq_dist_to(vec_col: Column, centroid: list[float]) -> Column:
    diffs = F.zip_with(
        vec_col, double_array(centroid), lambda a, b: a.cast("double") - b
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, d: acc + d * d)


def argmin_index(vec: Column, centroids: list[list[float]]) -> Column:
    """Index of the nearest centroid (squared L2), ties to the lower
    index — the shared codegen'd argmin (also used by
    operators/quantization.py for per-subspace code assignment and
    operators/ann_index.py for store-invariant recomputes).

    Shape matters here, twice over. (1) The obvious when-chain
    (least(d_0..d_k) then k `d_i == best` branches) instantiates every
    distance expression TWICE, and stacking several argmins in one plan
    (residual-PQ codes: m argmins after a cell when-chain) ballooned
    codegen'd task binaries past a 1 GB executor heap — so distances
    evaluate ONCE into an array and array_position takes the min
    (FIRST match = lowest index on ties; 1-based, hence the -1).
    (2) The centroid matrix enters the plan as ONE parsed literal
    (functions/vector.double_matrix) with a `transform` computing the
    per-centroid distances — building it element-wise costs a py4j
    round trip per float (k·dim ≈ 512 calls ≈ 1s at k=8/dim=64,
    more than the job that consumes the plan; measured r12)."""
    dists = F.transform(
        double_matrix(centroids),
        lambda c: F.aggregate(
            F.zip_with(vec, c, lambda a, b: a.cast("double") - b),
            F.lit(0.0),
            lambda acc, d: acc + d * d,
        ),
    )
    return (
        F.array_position(dists, F.array_min(dists)).cast("int") - 1
    )


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a ``cluster`` column: index of the nearest centroid (L2)."""
    return df.withColumn(
        "cluster", argmin_index(F.col(vec_col), centroids)
    )


def _centroids_of(
    df: DataFrame,
    vec_col: str,
    dim: int,
    old_centroids: list[list[float]] | None = None,
) -> dict[int, list[float]] | tuple[dict[int, list[float]], float]:
    """Per-(cluster, pos) means from one exploded aggregate.

    When ``old_centroids`` is given, the SAME aggregate also computes the
    within-cluster SSE of the current assignment (squared L2 distance
    decomposes per dimension, so sum((v - old_c[cluster][pos])^2) rides
    along as a second agg over the identical grouping — the convergence
    measurement costs zero extra jobs/scans) and a
    ``(centroids, sse)`` tuple is returned.
    """
    ex = df.select(
        "cluster", F.posexplode(F.col(vec_col)).alias("pos", "v")
    )
    aggs = [F.avg("v").alias("c")]
    if old_centroids is not None:
        mat = double_matrix(old_centroids)
        oc = F.element_at(
            F.element_at(mat, F.col("cluster") + 1), F.col("pos") + 1
        )
        d = F.col("v").cast("double") - oc
        aggs.append(F.sum(d * d).alias("sq"))
    rows = ex.groupBy("cluster", "pos").agg(*aggs).collect()
    out: dict[int, list[float]] = {}
    for r in rows:
        out.setdefault(r["cluster"], [0.0] * dim)[r["pos"]] = r["c"]
    if old_centroids is None:
        return out
    return out, float(sum(r["sq"] for r in rows))


def kmeans_fit_full(
    df: DataFrame,
    k: int = 4,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: list[list[float]] | None = None,
) -> tuple[DataFrame, list[float], list[list[float]]]:
    """Lloyd's algorithm, fixed iteration count; returns
    ``(assignments, sse_history, centroids)`` — the centroid matrix is
    the one the FINAL assignment used, so every returned assignment
    satisfies ``cluster == argmin_index(vec, centroids)``. Freezing that
    matrix (operators/ann_index.py) lets later vectors join the same
    partitioning without retraining.

    Seeds from the k lowest-id vectors (deterministic, no RNG). The
    centroid matrix (k × dim floats) is the ONLY driver-side state.
    ``sse_history[i]`` is the within-cluster SSE of the assignment under
    the centroids of round i (measured inside round i+1's centroid
    aggregate — no extra jobs); Lloyd guarantees it is non-increasing,
    which `kmeans_clusters` turns into a driver-checkable oracle.

    ``init``: warm-start centroid matrix (overrides ``k`` and the
    lowest-id seeding) — the retrain path
    (operators/ann_index.py retrain_ivf_index) starts Lloyd from the
    FROZEN quantizer, so ``sse_history[0]`` is the store's current
    assignment energy and monotonicity guarantees the retrained
    quantizer is never worse than the drifted one on the same data.
    """
    if init is not None:
        k = len(init)
        centroids = [[float(x) for x in c] for c in init]
    else:
        seed_rows = df.orderBy(id_col).limit(k).select(vec_col).collect()
        centroids = [[float(x) for x in r[vec_col]] for r in seed_rows]
    dim = len(centroids[0])
    assigned = assign_clusters(df, centroids, vec_col)
    sse_history: list[float] = []
    for _ in range(iterations):
        by_cluster, sse = _centroids_of(assigned, vec_col, dim, centroids)
        sse_history.append(sse)
        centroids = [by_cluster.get(i, centroids[i]) for i in range(k)]
        assigned = assign_clusters(df, centroids, vec_col)
    return assigned.select(id_col, "cluster"), sse_history, centroids


def kmeans_fit(
    df: DataFrame,
    k: int = 4,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[float]]:
    """Lloyd's algorithm; returns ``(assignments, sse_history)`` — see
    :func:`kmeans_fit_full` for the variant that also returns the final
    centroid matrix."""
    assigned, sse_history, _ = kmeans_fit_full(
        df, k, iterations, id_col, vec_col
    )
    return assigned, sse_history


def kmeans(
    df: DataFrame,
    k: int = 4,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's algorithm, fixed iteration count; returns (id, cluster)."""
    assigned, _ = kmeans_fit(df, k, iterations, id_col, vec_col)
    return assigned
