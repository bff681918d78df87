"""Vector expressions over array<float|double> embedding columns.

Dot product / norm / cosine as native higher-order-function expressions
(``zip_with`` + ``aggregate``) — JVM-side, codegen'd, no Python per row.
Accumulation is a strict left fold in element order, which both Spark and
the DuckDB oracle honor, so results are bit-deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _double_sql(x: float) -> str:
    """Exact SQL double literal for ``x``: Python ``repr`` is the
    shortest round-trip form and Spark's literal parser returns the
    nearest double — i.e. the identical bits back."""
    v = float(x)
    if v != v:
        return "CAST('NaN' AS DOUBLE)"
    if v == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if v == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return repr(v) + "D"


def double_array(xs) -> Column:
    """array<double> literal built in ONE expression parse.

    The obvious ``F.array(*[F.lit(float(x)) for x in xs])`` costs one
    py4j round trip per element — for the k×dim centroid matrices the
    ANN/k-means paths ship as plan literals that is 512 round trips
    (~1s measured at k=8, dim=64), more than the Spark job consuming
    the plan. Rendering the values into one SQL string hands the whole
    tree to the JVM parser in a single call (~10-20× faster to build;
    bit-identical values via :func:`_double_sql`)."""
    xs = list(xs)
    if not xs:
        return F.array().cast("array<double>")
    return F.expr("array(" + ",".join(_double_sql(x) for x in xs) + ")")


def double_matrix(rows) -> Column:
    """array<array<double>> literal in ONE expression parse — see
    :func:`double_array` for why (py4j per-element cost)."""
    rows = [list(r) for r in rows]
    if not rows:
        return F.array().cast("array<array<double>>")
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(_double_sql(x) for x in r) + ")"
            for r in rows
        )
        + ")"
    )


def dot(a: Column, b: Column) -> Column:
    """Σ a_i * b_i in double precision (left-to-right fold)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def l2_distance(a: Column, b: Column) -> Column:
    diffs = F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, d: acc + d * d))


def cosine_arrow(query_vec: list[float]):
    """Arrow-batched cosine against a FIXED query vector — the Python
    escape hatch, kept off the default path on purpose.

    The ``zip_with``/``aggregate`` fold above is JVM-side and codegen'd;
    at the 64-dim testdata scale the two are measured EQUAL (~0.36s per
    sf0.1 scan each), so the fold stays the default for what it buys:
    bit-deterministic strict-order accumulation (oracle-checkable) and no
    Python-worker dependency. The pandas_udf exists for the regime where
    numpy's vectorized dot amortizes the Arrow transfer — wide vectors
    (~1k dims) and fat scan batches; swap it in per-deployment after
    measuring, never by default.
    Batch math note: numpy uses pairwise summation vs the fold's strict
    left-to-right order, so results can differ in the last ulp — this
    variant is for serving/ANN paths, not for oracle-checked queries.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt(q @ q))

    def _cos(col):
        m = np.stack(col.to_numpy())  # (batch, dim) float64
        m = m.astype(np.float64, copy=False)
        norms = np.sqrt((m * m).sum(axis=1)) * qn
        dots = m @ q
        out = np.where(norms > 0, dots / np.where(norms == 0, 1.0, norms), 0.0)
        return pd.Series(out)

    # `from __future__ import annotations` stringifies inline hints, which
    # pandas_udf cannot resolve — attach real ones instead.
    _cos.__annotations__ = {"col": pd.Series, "return": pd.Series}
    return pandas_udf(_cos, "double")
