"""Product quantization (PQ) over an embedding column — the memory-side
half of large-scale ANN (Jégou et al. 2011, "Product Quantization for
Nearest Neighbor Search").

Why it matters at 100 TB: brute-force and IVF both keep full vectors in
the scan; PQ replaces each d-float vector with m single-byte codes (one
per contiguous subspace, each quantized against its own k-centroid
codebook) — 64 floats become 4 bytes here (64x) — and answers queries
with *asymmetric distance computation* (ADC): per query, precompute the
m x k table of exact squared distances from the query's subvectors to
every codebook centroid, then score a candidate as the SUM OF m TABLE
LOOKUPS, never touching the original vector. The codes table scans at
1/64th the bytes and the per-row cost is m array lookups, all inside
whole-stage codegen.

Composition with the rest of the ANN stack: IVF (operators/similarity.py)
prunes WHICH rows are scanned; PQ shrinks WHAT is scanned per row —
production systems (FAISS IVF-PQ) stack both, and both halves here are
plain DataFrame ops, so the composition is a filter + the ADC projection.

Training reuses the Lloyd machinery from operators/kmeans.py per
subspace (deterministic lowest-id seeding, SSE measured inside the
centroid aggregate). At 100 TB codebooks are trained on a deterministic
hash-sample of the corpus — the codebook is m*k*sub_dim floats of
driver-side state regardless of corpus size — then encoding is one
map-only pass over the full table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_weather_data_pipeline_spark.functions import vector as VX
from etl_weather_data_pipeline_spark.operators.kmeans import (
    _centroids_of,
    argmin_index,
    assign_clusters,
)


def _pq_train_frame(
    df: DataFrame, m: int, sd: int, id_col: str, vec_col: str
) -> DataFrame:
    """Narrow training projection: the id plus one ``sd``-float slice
    column per subspace. Persisted ONCE by pq_fit so every Lloyd
    aggregate of every subspace reads the cache instead of re-scanning
    (and re-slicing) the base table — without it a fit re-reads the
    base m*(iterations+1) times. Exposed for tests/test_plans.py's
    single-scan pin."""
    return df.select(
        F.col(id_col).alias("__id"),
        *[
            F.slice(F.col(vec_col), s * sd + 1, sd).alias(f"__sub{s}")
            for s in range(m)
        ],
    )


def pq_fit(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_fraction: float | None = None,
    max_train: int | None = None,
) -> tuple[list[list[list[float]]], list[list[float]]]:
    """Train one k-centroid codebook per contiguous subspace.

    Returns ``(codebooks, sse_histories)`` where ``codebooks[s][j]`` is
    centroid j of subspace s and ``sse_histories[s]`` is that
    subspace's within-cluster SSE per Lloyd round (non-increasing —
    the ann_pq_topk_battery property oracle asserts it).

    ``sample_fraction`` / ``max_train`` are the 100 TB path: codebooks
    need a representative sample, not the corpus (the driver-side state
    is m*k*sub_dim floats either way), so training runs on a
    DETERMINISTIC hash-bucket sample (operators/sampling.py — stable
    across runs, engines, and partitionings, unlike df.sample) of
    ~``sample_fraction`` of rows, or of ~``max_train`` rows (one count
    job converts it to a fraction; both given, the tighter wins).
    Encoding (pq_encode) still covers the FULL table. SSE histories
    stay non-increasing — Lloyd's monotonicity holds on whatever set
    it trains on.

    Deterministic: seeds are the k lowest-id TRAINING vectors'
    subvectors. The per-subspace slices are computed once into a
    persisted narrow frame (_pq_train_frame) — each Lloyd round per
    subspace is one exploded aggregate over the cache, never a base
    re-scan; same scale shape as operators/kmeans.py.
    """
    from etl_weather_data_pipeline_spark.operators.sampling import (
        deterministic_sample,
    )

    train = df
    frac = sample_fraction
    if max_train is not None:
        n = df.count()
        if n > max_train:
            f2 = max_train / n
            frac = f2 if frac is None else min(frac, f2)
    if frac is not None and frac < 1.0:
        train = deterministic_sample(df, id_col, frac)
    seed_rows = (
        train.orderBy(id_col).limit(k).select(vec_col).collect()
    )
    if len(seed_rows) < k:
        raise ValueError(
            f"pq_fit needs at least k={k} vectors to seed codebooks; "
            f"training set has {len(seed_rows)}"
        )
    dim = len(seed_rows[0][vec_col])
    assert dim % m == 0, f"dim {dim} not divisible into {m} subspaces"
    sd = dim // m
    proj = _pq_train_frame(train, m, sd, id_col, vec_col).persist()
    codebooks: list[list[list[float]]] = []
    histories: list[list[float]] = []
    try:
        for s in range(m):
            sub = proj.select(
                F.col("__id").alias(id_col),
                F.col(f"__sub{s}").alias("__sub"),
            )
            cents = [
                [float(x) for x in r[vec_col][s * sd : (s + 1) * sd]]
                for r in seed_rows
            ]
            assigned = assign_clusters(sub, cents, "__sub")
            hist: list[float] = []
            for _ in range(iterations):
                by_c, sse = _centroids_of(assigned, "__sub", sd, cents)
                hist.append(sse)
                cents = [by_c.get(i, cents[i]) for i in range(k)]
                assigned = assign_clusters(sub, cents, "__sub")
            codebooks.append(cents)
            histories.append(hist)
    finally:
        proj.unpersist()
    return codebooks, histories


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Map-only encoding: (id, codes array<int>) with codes[s] = index
    of subspace s's nearest codebook centroid. One pass, no shuffle.
    ``keep_cols`` rides extra columns along (the residual IVF-PQ path
    keeps the cell label — ADC needs it to pick the per-cell LUT)."""
    sd = len(codebooks[0][0])
    codes = F.array(
        *[
            argmin_index(F.slice(F.col(vec_col), s * sd + 1, sd), cb)
            for s, cb in enumerate(codebooks)
        ]
    )
    return df.select(
        F.col(id_col), *[F.col(c) for c in keep_cols], codes.alias("codes")
    )


def pq_residual_frame(
    df: DataFrame,
    centroids: dict[int, list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """(id, label, __res) with __res = x − centroid(cell) — the residual
    frame production IVF-PQ quantizes (FAISS IVFPQ: most of PQ's recall
    at a given byte budget comes from coding the residual, whose energy
    is far smaller than the raw vector's once the coarse quantizer has
    explained the cell). Map-only: the cell-centroid matrix is driver
    literals (cells × dim floats) selected by a codegen'd when-chain on
    the label, the subtraction a zip_with — no join, no shuffle."""
    cent = None
    for lbl in sorted(centroids):
        lit = VX.double_array(centroids[lbl])
        cond = F.col(label_col) == F.lit(lbl)
        cent = F.when(cond, lit) if cent is None else cent.when(cond, lit)
    res = F.zip_with(
        F.col(vec_col), cent, lambda a, b: a.cast("double") - b
    )
    return df.select(
        F.col(id_col), F.col(label_col), res.alias("__res")
    )


def pq_recon_sqerr(
    codebooks: list[list[list[float]]],
    vec_col: str,
    codes_col: str = "codes",
) -> Column:
    """Per-row squared reconstruction error ||v − v̂||² where v̂ is the
    codebook decode of ``codes`` — the quantity PQ training minimizes
    and the right basis for comparing two code designs at the same byte
    budget (per-query recall@10 deltas are coin flips on
    distance-concentrated data; reconstruction error is deterministic
    and aggregates over every row). Pure codegen: per subspace, one
    literal-matrix lookup + zip_with squared diff."""
    sd = len(codebooks[0][0])
    err = F.lit(0.0)
    for s, cb in enumerate(codebooks):
        mat = VX.double_matrix(cb)
        chat = F.element_at(
            mat, F.element_at(F.col(codes_col), s + 1) + 1
        )
        sub = F.slice(F.col(vec_col), s * sd + 1, sd)
        d = F.zip_with(sub, chat, lambda a, b: a.cast("double") - b)
        err = err + F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x * x)
    return err


def pq_adc_topk_residual(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    centroids: dict[int, list[float]],
    query_vec: list[float],
    probe_labels: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    label_col: str = "label",
) -> DataFrame:
    """Residual ADC top-k: codes quantize r = x − centroid(cell), so the
    query side must be residualized PER CELL — q_res_c = q −
    centroid(c) — giving one m × k lookup table per probed cell
    (n_probe · m · k driver floats, still plan literals). A row's
    approximate distance ||q − x||² ≈ ||q_res_cell − r||² is m lookups
    in ITS cell's table, chosen by a when-chain on the label — all
    whole-stage codegen, the raw vectors never read. The centroid term
    is thereby added back exactly (FAISS's precomputed-table trick is
    an algebraic split of the same quantity)."""
    sd = len(codebooks[0][0])
    dist: Column | None = None
    for lbl in probe_labels:
        qres = [
            float(q - c) for q, c in zip(query_vec, centroids[lbl])
        ]
        cell_dist = F.lit(0.0)
        for s, cb in enumerate(codebooks):
            qs = qres[s * sd : (s + 1) * sd]
            table = [
                float(sum((a - b) ** 2 for a, b in zip(qs, c)))
                for c in cb
            ]
            lut = VX.double_array(table)
            cell_dist = cell_dist + F.element_at(
                lut, F.element_at(F.col(codes_col), s + 1) + 1
            )
        cond = F.col(label_col) == F.lit(lbl)
        dist = (
            F.when(cond, cell_dist)
            if dist is None
            else dist.when(cond, cell_dist)
        )
    scored = encoded.select(
        F.col(id_col),
        F.round(dist.cast("decimal(28,10)"), 6)
        .cast("double")
        .alias("adc_dist"),
    )
    return scored.orderBy(F.col("adc_dist").asc(), F.col(id_col)).limit(k)


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "codes",
) -> DataFrame:
    """Asymmetric-distance top-k over the codes table: the m x k table
    of exact (query subvector -> centroid) squared distances is computed
    driver-side (m*k floats) and shipped as plan literals; each row's
    approximate distance is the sum of m array lookups. TakeOrdered
    top-k — no full sort shuffle, the full vectors are never read."""
    sd = len(codebooks[0][0])
    dist = F.lit(0.0)
    for s, cb in enumerate(codebooks):
        qs = query_vec[s * sd : (s + 1) * sd]
        table = [
            float(sum((a - b) ** 2 for a, b in zip(qs, c))) for c in cb
        ]
        lut = VX.double_array(table)
        dist = dist + F.element_at(
            lut, F.element_at(F.col(codes_col), s + 1) + 1
        )
    scored = encoded.select(
        F.col(id_col),
        F.round(dist.cast("decimal(28,10)"), 6)
        .cast("double")
        .alias("adc_dist"),
    )
    return scored.orderBy(F.col("adc_dist").asc(), F.col(id_col)).limit(k)


def pq_adc_topk_join(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """ADC top-k for MANY queries (the batch-serving shape, PQ twin of
    similarity.topk_join): broadcast the small query set, build each
    subspace's 16-entry distance table IN-PLAN from the query-vector
    column against the literal codebook (so one codegen'd expression
    serves every query row), score a candidate as m table lookups, and
    window top-k per query. The codes table is the only big side and it
    never shuffles before the per-query top-k."""
    from pyspark.sql.window import Window

    from etl_weather_data_pipeline_spark.operators.kmeans import (
        _sq_dist_to,
    )

    sd = len(codebooks[0][0])
    dist: Column | None = None
    for s, cb in enumerate(codebooks):
        q_sub = F.slice(F.col(q_vec_col), s * sd + 1, sd)
        lut = F.array(*[_sq_dist_to(q_sub, c) for c in cb])
        term = F.element_at(
            lut, F.element_at(F.col(codes_col), s + 1) + 1
        )
        dist = term if dist is None else dist + term
    scored = encoded.crossJoin(F.broadcast(queries)).select(
        F.col(q_id_col),
        F.col(id_col),
        F.round(dist.cast("decimal(28,10)"), 6)
        .cast("double")
        .alias("adc_dist"),
    )
    w = Window.partitionBy(q_id_col).orderBy(
        F.col("adc_dist").asc(), F.col(id_col)
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
