"""Connected components over an edge list — iterative min-label propagation.

The transitive-closure stage of near-duplicate deduplication: LSH+Jaccard
verification emits PAIRS, but a dedup decision needs CLUSTERS (a~b and
b~c put a, b, c in one group even when a~c was never scored). Label
propagation finds each node's component as the minimum node id reachable
from it.

Scale shape: each iteration is one equi-join (labels onto the undirected
edge list) + one min-aggregate — both hash-partitioned on node id, no
driver-side graph. Iterations are bounded by the component DIAMETER, not
the graph size; near-dup clusters are shallow (diameter a handful), so a
few rounds converge. Lineage is cut with localCheckpoint per round —
without it the plan doubles every iteration and the optimizer re-walks an
exponentially growing tree. Pass ``checkpoint_dir=`` to switch the cuts
to reliable checkpoints (durable storage, survives executor loss) for
real-cluster runs.

Convergence is detected with a changed-label count, one tiny action per
round, same pattern as operators/kmeans.py.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ComponentsNotConverged(RuntimeWarning):
    """Label propagation exhausted max_iter with labels still changing —
    some cluster_ids are NOT the true component minimum. Distinguishes a
    diameter overflow from an oracle/correctness bug."""


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Components of the undirected graph given by ``edges``.

    Returns (doc_id, cluster_id) for every node appearing in an edge,
    where cluster_id is the minimum node id in the component —
    deterministic, order-independent.

    If a component's diameter exceeds ``max_iter`` the loop exits with
    labels still moving; a :class:`ComponentsNotConverged` warning is
    emitted so the (now possibly split) clusters are diagnosable rather
    than a silent wrong answer.

    ``checkpoint_dir``: when given, per-round lineage cuts use RELIABLE
    checkpoints written under this directory (``setCheckpointDir`` +
    ``checkpoint(eager=False)``) instead of executor-local ones. Local
    checkpoints are the fast default for a healthy cluster, but their
    blocks live in executor storage — losing an executor mid-job loses
    rounds of progress. On a real multi-tenant cluster pass a durable
    path (HDFS/S3); this is the 100 TB-safety knob the module docstring
    promises. ``setCheckpointDir`` is SESSION-GLOBAL state; any
    checkpoint dir the session had configured before the call is
    restored on return (safe here because every lazy checkpoint this
    function creates is materialized by its round's convergence count,
    inside the call — nothing checkpoints after return). A session with
    NO prior dir keeps ours (Spark has no unset), which is documented
    rather than hidden.
    """
    prev_ckpt_dir: str | None = None
    if checkpoint_dir is not None:
        sc = edges.sparkSession.sparkContext
        prev_ckpt_dir = sc.getCheckpointDir()
        sc.setCheckpointDir(checkpoint_dir)

    def _cut(df: DataFrame) -> DataFrame:
        if checkpoint_dir is None:
            return df.localCheckpoint(eager=False)
        return df.checkpoint(eager=False)

    und = _cut(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        und.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )
    changed = 1
    for _ in range(max_iter):
        # One job per round: the neighbor messages and the node's own
        # (label, old=label) row go through a single min/max aggregate —
        # `old` recovers each node's previous label (exactly one non-null
        # per id) so convergence needs no join — and the lazy
        # localCheckpoint is materialized by the convergence count itself
        # rather than by a separate eager checkpoint job.
        msgs = und.join(labels, und.a == labels.id).select(
            F.col("b").alias("id"),
            "label",
            F.lit(None).cast(labels.schema["label"].dataType).alias("old"),
        )
        own = labels.select("id", "label", F.col("label").alias("old"))
        new = _cut(
            msgs.union(own)
            .groupBy("id")
            .agg(F.min("label").alias("label"), F.max("old").alias("old"))
        )
        changed = new.filter(F.col("label") != F.col("old")).count()
        labels = new.select("id", "label")
        if changed == 0:
            break
    if prev_ckpt_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(prev_ckpt_dir)
    if changed:
        warnings.warn(
            f"connected_components: {changed} labels still changing after "
            f"max_iter={max_iter} — a component's diameter exceeds the "
            "iteration budget and its cluster_ids are not fully propagated",
            ComponentsNotConverged,
            stacklevel=2,
        )
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )
