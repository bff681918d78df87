"""Tests for the non-SQL-expressible LLM-ops (rows-only in the driver):
IVF ANN vs brute-force ground truth, multimodal decode plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_weather_data_pipeline_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_bucket,
    topk_join,
)
from etl_weather_data_pipeline_spark.plans.catalog import load
from etl_weather_data_pipeline_spark.streaming.multimodal import (
    decode_features,
    frame_sample,
)

from tests.conftest import SF_SMOKE


def _query_vec(spark):
    emb = load(spark, SF_SMOKE, "embeddings")
    return [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]


def test_ivf_recall_vs_brute_force(spark):
    emb = load(spark, SF_SMOKE, "embeddings")
    qv = _query_vec(spark)
    exact = {r["vec_id"] for r in brute_force_topk(emb, qv, k=10).collect()}
    approx = {r["vec_id"] for r in ivf_topk(emb, qv, k=10, n_probe=3).collect()}
    # IVF with 3/10 cells probed must still find most true neighbors;
    # the query vector itself (vec_id 0) must always be found.
    assert 0 in approx
    assert len(exact & approx) >= 5


def test_topk_join_multiquery(spark):
    emb = load(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(0, 1)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = topk_join(emb, queries, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append(r)
    assert set(by_q) == {0, 1}
    assert all(len(v) == 5 for v in by_q.values())
    # each query's own vector is its nearest neighbor (cosine 1.0)
    for qid, rows in by_q.items():
        best = max(rows, key=lambda r: r["cosine"])
        assert best["vec_id"] == qid and best["cosine"] == 1.0


def test_lsh_bucket_deterministic(spark):
    emb = load(spark, SF_SMOKE, "embeddings").limit(50)
    planes = [[(1.0 if (i + j) % 3 == 0 else -0.5) for i in range(64)] for j in range(4)]
    b1 = emb.select("vec_id", lsh_bucket(F.col("embedding"), planes).alias("b"))
    b2 = emb.select("vec_id", lsh_bucket(F.col("embedding"), planes).alias("b"))
    assert sorted(map(tuple, b1.collect())) == sorted(map(tuple, b2.collect()))
    n_buckets = b1.select("b").distinct().count()
    assert 1 < n_buckets <= 16  # 4 planes -> at most 16 buckets


def test_multimodal_decode_schema_and_determinism(spark):
    docs = load(spark, SF_SMOKE, "documents").limit(20)
    payloads = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    out = decode_features(payloads)
    assert out.columns == [
        "doc_id", "byte_len", "head_byte", "checksum", "width", "height",
    ]
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 20
    # byte_len must equal the utf-8 length of the text (ASCII corpus)
    for r in docs.collect():
        assert rows[r["doc_id"]]["byte_len"] == len(r["text"])
    # deterministic across runs
    rows2 = {r["doc_id"]: r for r in decode_features(payloads).collect()}
    assert rows == rows2


def test_frame_sample_fanout(spark):
    docs = load(spark, SF_SMOKE, "documents").limit(5)
    payloads = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    out = frame_sample(payloads, every_n_bytes=16, max_frames=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {r["doc_id"] for r in docs.collect()}
    for rows in by_doc.values():
        assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == list(
            range(len(rows))
        )
        assert all(r["offset"] == r["frame_idx"] * 16 for r in rows)


def test_approx_aggregates_error_bounds(spark):
    """approx_count_distinct / percentile_approx must be within documented
    error of exact values (rows-only in the driver, bounded here)."""
    from etl_weather_data_pipeline_spark.plans.catalog import build_registry

    reg = build_registry()
    approx = {
        r["event_type"]: r
        for r in reg["approx_aggregates"].spark(spark, SF_SMOKE).collect()
    }
    ev = load(spark, SF_SMOKE, "events")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.median("value").alias("med"),
        )
        .collect()
    }
    for et, e in exact.items():
        a = approx[et]
        assert abs(a["approx_users"] - e["users"]) <= max(0.05 * e["users"], 2)
        assert abs(a["approx_median"] - e["med"]) <= 0.2 * max(abs(e["med"]), 1)
        assert a["approx_p25"] <= a["approx_median"] <= a["approx_p75"]


def test_kmeans_improves_over_iterations(spark):
    """k-means must (a) be deterministic, (b) not increase within-cluster
    SSE across iterations, (c) produce non-degenerate clusters."""
    from etl_weather_data_pipeline_spark.operators.kmeans import (
        assign_clusters,
        kmeans,
    )

    emb = load(spark, SF_SMOKE, "embeddings")
    out1 = {r["vec_id"]: r["cluster"] for r in kmeans(emb, k=4, iterations=3).collect()}
    out2 = {r["vec_id"]: r["cluster"] for r in kmeans(emb, k=4, iterations=3).collect()}
    assert out1 == out2  # deterministic
    assert len(set(out1.values())) == 4  # all clusters populated

    def sse(iters):
        from etl_weather_data_pipeline_spark.operators.kmeans import _centroids_of

        seed = [ [float(x) for x in r["embedding"]]
                 for r in emb.orderBy("vec_id").limit(4).select("embedding").collect() ]
        assigned = assign_clusters(emb, seed)
        cents = seed
        for _ in range(iters):
            by_c = _centroids_of(assigned, "embedding", 64)
            cents = [by_c.get(i, cents[i]) for i in range(4)]
            assigned = assign_clusters(emb, cents)
        total = 0.0
        rows = assigned.select("embedding", "cluster").collect()
        for r in rows:
            c = cents[r["cluster"]]
            total += sum((float(v) - c[i]) ** 2 for i, v in enumerate(r["embedding"]))
        return total

    assert sse(3) <= sse(1) + 1e-9
