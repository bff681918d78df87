"""Distributed logistic regression via batch gradient descent — plain
DataFrame aggregates, the quality-classifier half of CCNet-style
curation (Wenzek et al. 2020 train a source-membership classifier —
"does this look like the curated corpus?" — and filter the crawl by its
score; LLaMA's data pipeline does the same with a wiki-reference
classifier).

Scale shape: the weight vector travels INSIDE the plan as literals
(like operators/kmeans.py centroids), and each GD iteration is ONE
map-side pass + one aggregate producing every partial gradient and the
loss together — no per-row Python, no shuffle beyond the single
partial+final aggregate, driver state = d+1 floats. Full-batch GD on a
convex loss: with a step below 2/L (features normalized to [0,1] keep
the Lipschitz bound small) the loss is non-increasing every iteration,
which the property oracle pins.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _margin(feature_cols: list[str], weights: list[float]) -> Column:
    """bias + w·x as a codegen'd expression (weights are plan literals)."""
    z = F.lit(float(weights[0]))
    for c, w in zip(feature_cols, weights[1:]):
        z = z + F.lit(float(w)) * F.col(c)
    return z


def _log_loss(p: Column, y: Column) -> Column:
    """Mean binary cross-entropy (clipped) — ONE definition shared by
    the per-iteration measurement and the final-weights pass, so the
    loss_monotone gate boolean can't be broken by a one-sided edit."""
    eps = F.lit(1e-12)
    return F.avg(
        -(
            y * F.log(p + eps)
            + (F.lit(1.0) - y) * F.log(F.lit(1.0) - p + eps)
        )
    )


def logreg_score(feature_cols: list[str], weights: list[float]) -> Column:
    """Sigmoid score column for a fitted model — map-side, broadcastable
    to any corpus size."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(feature_cols, weights)))


def logreg_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 0.5,
    iterations: int = 10,
) -> tuple[list[float], list[float]]:
    """Fit by full-batch gradient descent from w = 0; returns
    ``(weights, losses)`` where ``losses[i]`` is the mean log-loss
    BEFORE iteration i's update (losses[0] = loss at w = 0 = ln 2), plus
    a final entry for the fitted weights — len(losses) = iterations + 1.

    Each iteration is one aggregate: every partial gradient component
    and the current loss ride the same pass. Deterministic given
    deterministic inputs: gradient/loss sums are floating-point adds in
    partition order, so exact reproducibility across CLUSTER layouts
    needs the decimal-sum route — fine here because the property oracle
    asserts monotonicity, not bitwise weights.
    """
    d = len(feature_cols)
    w = [0.0] * (d + 1)
    losses: list[float] = []
    y = F.col(label_col).cast("double")
    for _ in range(iterations):
        p = logreg_score(feature_cols, w)
        err = p - y
        aggs = [_log_loss(p, y).alias("loss"), F.avg(err).alias("g0")] + [
            F.avg(err * F.col(c)).alias(f"g{j + 1}")
            for j, c in enumerate(feature_cols)
        ]
        row = df.agg(*aggs).first()
        losses.append(float(row["loss"]))
        w = [
            wi - lr * float(row[f"g{j}"]) for j, wi in enumerate(w)
        ]
    # loss under the final weights
    p = logreg_score(feature_cols, w)
    final = df.agg(_log_loss(p, y).alias("loss")).first()["loss"]
    losses.append(float(final))
    assert all(math.isfinite(x) for x in w), w
    return w, losses
