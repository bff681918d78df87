"""Similarity search over embedding columns (array<float>).

Two tiers:
  brute_force_topk — exact cosine top-k; the correctness baseline. O(N·d)
    per query, fully distributed (map + single top-k reduce); right answer
    for <10M rows or as the verify stage.
  ivf_topk — IVF-style: assign vectors to coarse cells (precomputed
    centroids / labels), probe only the nearest cells. The 100 TB path:
    candidate set shrinks by the cell fan-out, shuffle is an equi-join on
    cell id.

Random-hyperplane LSH bucketing is also provided for cheap cell assignment
when no centroids exist.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_weather_data_pipeline_spark.functions import vector as VX


def _as_literal_vec(vec: list[float]) -> Column:
    return VX.double_array(vec)


def _dround6(c: Column) -> Column:
    """Decimal-routed 6-digit rounding: deterministic across engines
    (plain double round disagrees with DuckDB on ties — see
    plans/catalog.py docstring)."""
    return F.round(c.cast("decimal(28,10)"), 6).cast("double")


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    The per-row cosine is a codegen'd fold; the top-k is a TakeOrdered —
    map-side partial top-k then a tiny driver merge, no full sort shuffle.
    """
    q = _as_literal_vec(query_vec)
    scored = df.select(
        F.col(id_col),
        _dround6(VX.cosine(F.col(vec_col), q)).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def topk_join(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Top-k neighbors for MANY queries: broadcast the (small) query set,
    score every (vector, query) pair map-side, window top-k per query."""
    from pyspark.sql.window import Window

    scored = df.crossJoin(F.broadcast(queries)).select(
        F.col(q_id_col),
        F.col(id_col),
        _dround6(VX.cosine(F.col(vec_col), F.col(q_vec_col))).alias("cosine"),
    )
    w = Window.partitionBy(q_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def lsh_bucket(
    vec_col: Column, planes: list[list[float]]
) -> Column:
    """Random-hyperplane LSH bucket id: one sign bit per plane packed into a
    long. Planes are fixed literals (deterministic, broadcast-free)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        bit = F.when(VX.dot(vec_col, _as_literal_vec(p)) >= 0, 1).otherwise(0)
        bucket = bucket + (bit.cast("long") * F.lit(1 << i).cast("long"))
    return bucket


def cell_centroids(
    df: DataFrame,
    cell_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cell mean vector via posexplode + two-level groupBy — scales
    linearly, no collect. Compute ONCE per table (or per table version)
    and pass to every :func:`ivf_topk` call: the centroid scan is the
    expensive half of an IVF probe, and it is query-independent.
    """
    return (
        df.select(F.col(cell_col), F.posexplode(F.col(vec_col)).alias("pos", "v"))
        .groupBy(cell_col, "pos")
        .agg(F.avg("v").alias("c"))
        .groupBy(cell_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select(
            cell_col,
            F.transform(F.col("pc"), lambda s: s["c"]).alias("centroid"),
        )
    )


def choose_probe_cells(
    centroids: DataFrame,
    query_vec: list[float],
    n_probe: int = 3,
    cell_col: str = "label",
) -> list:
    """The ``n_probe`` cell ids whose centroids are nearest the query —
    THE probe-selection rule, shared by :func:`ivf_topk`, the persisted
    index probe (operators/ann_index.py), and the trained-IVF property
    query, so a change here cannot desync any of them. Ordering is raw
    cosine DESC with the cell id as tie-break: without the tie-break, a
    double tie at the n_probe boundary makes the probe SET
    nondeterministic across jobs — and the probe-monotonicity property
    oracles require n_probe=3's set to be a prefix of n_probe=5's."""
    q = _as_literal_vec(query_vec)
    probe_rows = (
        centroids.select(
            cell_col, VX.cosine(F.col("centroid"), q).alias("sim")
        )
        .orderBy(F.col("sim").desc(), F.col(cell_col))
        .limit(n_probe)
        .collect()
    )
    return [r[cell_col] for r in probe_rows]


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    n_probe: int = 3,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: centroids per existing cell column, probe the
    ``n_probe`` cells whose centroids are nearest the query, brute-force
    inside them. Two small jobs (centroids, probe choice) + one pruned scan.

    ``centroids``: pass a precomputed (ideally cached) result of
    :func:`cell_centroids` to amortize the centroid scan across queries —
    otherwise each call recomputes it from ``df``.

    At 100 TB the table is written partitioned/clustered by cell id, so the
    probe scan prunes to n_probe partitions — the candidate set (and the
    shuffle) shrinks by cells/n_probe. ``operators/ann_index.py``
    implements exactly that layout as a persisted store.
    """
    cent = (
        centroids
        if centroids is not None
        else cell_centroids(df, cell_col, vec_col)
    )
    probe_cells = choose_probe_cells(cent, query_vec, n_probe, cell_col)
    pruned = df.filter(F.col(cell_col).isin(probe_cells))
    return brute_force_topk(pruned, query_vec, k, id_col, vec_col)


def kmeans_cells(
    df: DataFrame,
    k: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """Attach a TRAINED coarse-quantizer cell id — FAISS's actual IVF
    design (Voronoi cells from k-means over the vectors themselves)
    rather than a metadata column. Pure composition glue: the result
    feeds ``ivf_topk(cell_col="cell")`` unchanged, and the residual PQ
    path (``pq_residual_frame(label_col="cell")``) the same way, giving
    the full trained IVF/IVF-PQ stack from existing operators.

    Deterministic (kmeans_fit seeds from the k lowest ids); one
    equi-join on the id attaches assignments — at 100 TB you'd persist
    the assigned table clustered by cell so the probe scan prunes to
    n_probe partitions (ivf_topk's documented layout contract)."""
    from etl_weather_data_pipeline_spark.operators.kmeans import kmeans_fit

    asg, _ = kmeans_fit(
        df, k=k, iterations=iterations, id_col=id_col, vec_col=vec_col
    )
    return df.join(asg.withColumnRenamed("cluster", cell_col), id_col)
