"""Skew mitigation: salted two-stage aggregation and salted broadcast join.

At 100 TB a handful of hot keys (a viral document, a default user id) can
pin an entire stage on one task. AQE's skew-join handling (enabled in
session.py) covers sort-merge joins at runtime; these operators cover the
cases AQE can't: skewed *aggregations* (salt → partial agg on (key, salt)
→ final agg on key) and hot-key broadcast joins (explode the small side
per salt).

Salting preserves exact semantics for decomposable aggregates (sum, count,
min, max) — the salted plan is oracle-checked against a plain GROUP BY.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 8,
    salt_source: Column | None = None,
) -> DataFrame:
    """Two-stage aggregation over skewed keys.

    ``aggs`` maps output column name → (partial_agg_expr, final_agg_expr)
    where the partial expr runs per (key, salt) and the final expr
    combines the per-salt partials (e.g. ``("n", (F.count(F.lit(1)),
    F.sum(...)))``). The salt is derived deterministically (pmod of a
    stable column, or a hash of all columns) so results are reproducible.

    Stage 1 shuffles on (keys, salt) — n_salts × more groups, so each hot
    key splits across n_salts tasks; stage 2 shuffles the tiny per-salt
    partials on keys alone.
    """
    salt = (
        F.pmod(salt_source, F.lit(n_salts))
        if salt_source is not None
        else F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[p.alias(f"__p_{name}") for name, (p, _) in aggs.items()])
    )
    final_aggs = []
    for name, (_, fin) in aggs.items():
        final_aggs.append(fin(F.col(f"__p_{name}")).alias(name))
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    big_salt_source: Column | None = None,
) -> DataFrame:
    """Equi-join where ``big`` has hot keys: salt the big side, explode the
    small side once per salt value, join on (key, salt). The shuffle (if
    any) spreads each hot key over n_salts partitions; with a broadcast
    small side there is no shuffle at all and the join parallelism still
    improves because downstream operators see the salted distribution."""
    salt = (
        F.pmod(big_salt_source, F.lit(n_salts))
        if big_salt_source is not None
        else F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(F.broadcast(small_s), [key, "__salt"]).drop("__salt")
