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


def _sq_dist_to(vec_col: Column, centroid: list[float]) -> Column:
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    diffs = F.zip_with(vec_col, lit, lambda a, b: a.cast("double") - b)
    return F.aggregate(diffs, F.lit(0.0), lambda acc, d: acc + d * d)


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a ``cluster`` column: index of the nearest centroid (L2)."""
    dists = [_sq_dist_to(F.col(vec_col), c) for c in centroids]
    best = F.least(*dists) if len(dists) > 1 else dists[0]
    cluster = F.lit(len(centroids) - 1)
    for i in range(len(centroids) - 2, -1, -1):
        cluster = F.when(dists[i] == best, F.lit(i)).otherwise(cluster)
    return df.withColumn("cluster", cluster)


def _centroids_of(df: DataFrame, vec_col: str, dim: int) -> dict[int, list[float]]:
    rows = (
        df.select("cluster", F.posexplode(F.col(vec_col)).alias("pos", "v"))
        .groupBy("cluster", "pos")
        .agg(F.avg("v").alias("c"))
        .collect()
    )
    out: dict[int, list[float]] = {}
    for r in rows:
        out.setdefault(r["cluster"], [0.0] * dim)[r["pos"]] = r["c"]
    return out


def kmeans(
    df: DataFrame,
    k: int = 4,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's algorithm, fixed iteration count; returns (id, cluster).

    Seeds from the k lowest-id vectors (deterministic, no RNG). The
    centroid matrix (k × dim floats) is the ONLY driver-side state.
    """
    seed_rows = df.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = [[float(x) for x in r[vec_col]] for r in seed_rows]
    dim = len(centroids[0])
    assigned = assign_clusters(df, centroids, vec_col)
    for _ in range(iterations):
        by_cluster = _centroids_of(assigned, vec_col, dim)
        centroids = [by_cluster.get(i, centroids[i]) for i in range(k)]
        assigned = assign_clusters(df, centroids, vec_col)
    return assigned.select(id_col, "cluster")
