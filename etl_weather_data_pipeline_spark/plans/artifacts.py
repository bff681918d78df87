"""Session-memoized per-document corpus artifacts (the artifact store).

A production corpus pipeline materializes the expensive PER-DOCUMENT
derivations — Rabin-Karp k-gram hash arrays, MinHash signatures,
distinct-token sets — ONCE per corpus version as persisted tables, and
every downstream dedup / passage / probe / funnel job derives from
them. This repo's incremental-funnel and streaming-store docstrings
already promise exactly that amortization ("the store's fingerprint and
signature tables are maintained persistently"); this module is the
batch-side realization at session scope, prescribed by the r10 verdict
(directive #1: share one persisted execution across the funnel and the
recall probes within a bench session).

Sharing is SEMANTICS-PRESERVING by construction, and the boundary is
strict:

- Only ROW-LOCAL DETERMINISTIC map results over the raw ``documents``
  table are memoized. For any subset S of documents (same doc_id, same
  text — e.g. a funnel's survivor set), artifact(S) == artifact(docs)
  semi-joined to S's ids, because no artifact row depends on any other
  document.
- Corpus-DEPENDENT statistics (gram min/max_occ occurrence windows,
  winnow fingerprint df stop bounds, band tables, candidate joins)
  are NEVER memoized — each query recomputes them over its own input
  relation, exactly as before.
- VECTOR-SIDE driver literals (r11 verdict directive #5): trained
  k-means centroid matrices + SSE histories ARE memoized, under a
  stricter rule than subset-stability — EXACT-INPUT sharing. A memo
  entry is keyed by the full training spec (input relation name, k,
  iterations), so a consumer hits it only when it would have run the
  IDENTICAL deterministic training (lowest-id seeding, fixed
  iterations — operators/kmeans.py has no RNG); sharing is therefore
  bit-identical, not merely equivalent. Queries whose training IS
  their scenario (the drift-report and semdedup-global builds train on
  deliberate subsets and then retrain) never touch these memos.

Lifecycle: keyed by (applicationId, sf_dir, artifact, params), persisted
MEMORY_AND_DISK, at most TWO sf_dirs resident (the oracle-parity suite
alternates the two gate SFs per query; a third evicts the
least-recently-used — the bench session's sf0.001 warmup then sf0.1
timing fits without thrash). ``release_shared_artifacts()`` drops
everything; `plans.llmops.release_curation_cache` deliberately does NOT
touch this registry (per-query intermediates release between queries,
the artifact store is the thing that must survive them).

Bench accounting: per-query bench numbers measure the incremental cost
GIVEN the artifact store; the cold build itself is timed explicitly as
the ``corpus_artifacts_build`` bench entry (bench.py), so the one-time
cost appears in the total exactly once — the way a production pipeline
pays it.
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession

from etl_weather_data_pipeline_spark.plans.catalog import load

# Registry bookkeeping lock (r14 optimization): build_all overlaps the
# independent artifact builds from a small thread pool (guide §2.6 —
# concurrent jobs back-fill executor cores a single tiny-scan build
# leaves idle), so LRU/dict mutation must be atomic. Builds themselves
# run OUTSIDE the lock — serializing them would undo the overlap.
_REG_LOCK = threading.Lock()
# key -> persisted DataFrame; key = (applicationId, sf_dir, name)
_ARTIFACTS: dict[tuple, DataFrame] = {}
# key -> driver literal (centroid matrices etc.); same key shape + LRU
_DRIVER_ARTIFACTS: dict[tuple, object] = {}
# name -> build count (the test pin that consumers share one training
# pass: re-running a consumer must NOT bump its artifact's counter)
_BUILD_COUNTS: dict[str, int] = {}
# sf_dir LRU (most-recent last); at most _MAX_SF_DIRS resident
_SF_LRU: list[tuple] = []
_MAX_SF_DIRS = 2


def release_shared_artifacts() -> None:
    """Unpersist and forget every memoized artifact (bench end-of-run /
    test isolation). Safe at any time: unpersist never invalidates
    results, it only forces the next consumer to rebuild."""
    with _REG_LOCK:
        dfs = list(_ARTIFACTS.values())
        _ARTIFACTS.clear()
        _DRIVER_ARTIFACTS.clear()
        _SF_LRU.clear()
    for df in dfs:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "documents").select("doc_id", "text")


def _touch_lru(spark: SparkSession, sf_dir: str) -> tuple:
    # touch the LRU on EVERY access, not just builds — otherwise
    # eviction degenerates to build-order FIFO and a third sf_dir can
    # evict the one actively in use (r11 review)
    sf_key = (spark.sparkContext.applicationId, sf_dir)
    if sf_key in _SF_LRU:
        _SF_LRU.remove(sf_key)
    _SF_LRU.append(sf_key)
    return sf_key


def _evict_over_budget() -> None:
    while len(_SF_LRU) > _MAX_SF_DIRS:
        evict = _SF_LRU.pop(0)
        for k in [k for k in _ARTIFACTS if k[:2] == evict]:
            try:
                _ARTIFACTS.pop(k).unpersist()
            except Exception:
                pass
        for k in [k for k in _DRIVER_ARTIFACTS if k[:2] == evict]:
            _DRIVER_ARTIFACTS.pop(k)


def _get(spark: SparkSession, sf_dir: str, name: str, build) -> DataFrame:
    from pyspark import StorageLevel

    with _REG_LOCK:
        sf_key = _touch_lru(spark, sf_dir)
        key = (*sf_key, name)
        if key in _ARTIFACTS:
            return _ARTIFACTS[key]
        _evict_over_budget()
    # build outside the lock so concurrent _get calls for DIFFERENT
    # artifacts overlap (build_all's thread pool); a same-key race can
    # only double-build a bit-identical frame — the loser unpersists
    built = build().persist(StorageLevel.MEMORY_AND_DISK)
    with _REG_LOCK:
        if key in _ARTIFACTS:
            built.unpersist()
            return _ARTIFACTS[key]
        if sf_key not in _SF_LRU:
            # the sf_dir was evicted/released while this build was in
            # flight — registering now would orphan the entry outside
            # the LRU budget; hand the frame back uncached instead
            built.unpersist()
            return built
        _ARTIFACTS[key] = built
        # the bump rides REGISTRATION so a same-key race counts one
        # training pass (the documented pin), not one per racing thread
        _BUILD_COUNTS[name] = _BUILD_COUNTS.get(name, 0) + 1
    return built


def _get_literal(spark: SparkSession, sf_dir: str, name: str, build):
    """Memo for DRIVER-LITERAL artifacts (k×dim centroid matrices, SSE
    histories) — same key shape and sf_dir LRU as :func:`_get`, no
    persist (nothing executor-side to pin)."""
    with _REG_LOCK:
        sf_key = _touch_lru(spark, sf_dir)
        key = (*sf_key, name)
        if key in _DRIVER_ARTIFACTS:
            return _DRIVER_ARTIFACTS[key]
        _evict_over_budget()
    built = build()
    with _REG_LOCK:
        # deterministic training: a same-key race built the identical
        # literal, so returning either copy is value-neutral
        if key in _DRIVER_ARTIFACTS:
            return _DRIVER_ARTIFACTS[key]
        if sf_key not in _SF_LRU:
            # evicted/released mid-build — don't orphan an entry
            # outside the LRU budget; the literal is still usable
            return built
        _DRIVER_ARTIFACTS[key] = built
        _BUILD_COUNTS[name] = _BUILD_COUNTS.get(name, 0) + 1
        return built


def shared_rolling_hashes(
    spark: SparkSession, sf_dir: str, k: int
) -> DataFrame:
    """(doc_id, __h) Rabin-Karp k-gram hash arrays over the raw
    documents table (operators/passages.py rolling_hashes) — the
    dominant map cost of every winnow / exact-passage / CDC consumer."""
    from etl_weather_data_pipeline_spark.operators.passages import (
        rolling_hashes,
    )

    return _get(
        spark, sf_dir, f"rolling_hashes_k{k}",
        lambda: rolling_hashes(_docs(spark, sf_dir), k=k),
    )


def shared_minhash_sigs(
    spark: SparkSession,
    sf_dir: str,
    num_hashes: int = 8,
    shingle_k: int = 3,
    hash_family: str = "md5",
) -> DataFrame:
    """(doc_id, h0..h{n-1}) MinHash signature table over the raw
    documents table (operators/dedup.py minhash_signatures)."""
    from etl_weather_data_pipeline_spark.operators.dedup import (
        minhash_signatures,
    )

    return _get(
        spark, sf_dir,
        f"minhash_{hash_family}_{num_hashes}x{shingle_k}",
        lambda: minhash_signatures(
            _docs(spark, sf_dir),
            num_hashes=num_hashes,
            shingle_k=shingle_k,
            hash_family=hash_family,
        ),
    )


def shared_token_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, __toks, __n) distinct-token sets over the raw documents
    table — the Jaccard-verify side input (operators/dedup.py
    token_sets)."""
    from etl_weather_data_pipeline_spark.operators.dedup import token_sets

    return _get(
        spark, sf_dir, "token_sets",
        lambda: token_sets(_docs(spark, sf_dir)),
    )


def shared_kmeans_centroids(
    spark: SparkSession, sf_dir: str, k: int, iterations: int = 3
) -> tuple[list[float], list[list[float]]]:
    """(sse_history, centroids) from deterministic Lloyd over the raw
    ``embeddings`` table (operators/kmeans.py kmeans_fit_full — lowest-id
    seeding, fixed iterations, no RNG) — the vector-side analogue of
    shared_minhash_sigs (r11 verdict directive #5). Consumers recompute
    assignments MAP-SIDE via argmin_index over the returned matrix,
    which is exactly the rule kmeans_fit_full's own final assignment
    satisfies — so sharing replaces a per-query Lloyd run AND its
    assignment join with one memoized literal + a codegen'd map.

    Bench accounting note (r13): TWO timed bench consumers now share
    the (k=8, i=3) memo — ann_ivf_trained_topk (HEADLINE min-of-N) and
    the semantic_attach_judge callable (which freezes the memoized
    matrix into its store's IVF quantizer via
    semantic_bootstrap_centroids) — so, per the rule stated here since
    r11, that build moved into build_all: corpus_artifacts_build
    charges the Lloyd run exactly once and both consumers measure
    incremental cost given the memo (build-counter pin in
    tests/test_plans.py). Other specs (k=4; the probe's data-dependent
    k) still self-charge on first use — no timed path consumes them."""
    from etl_weather_data_pipeline_spark.operators.kmeans import (
        kmeans_fit_full,
    )

    def build():
        emb = load(spark, sf_dir, "embeddings")
        _, sse, cents = kmeans_fit_full(emb, k=k, iterations=iterations)
        return (sse, cents)

    return _get_literal(
        spark, sf_dir, f"kmeans_centroids_k{k}_i{iterations}", build
    )


def build_all(spark: SparkSession, sf_dir: str, k: int = 8) -> dict:
    """Cold-build + materialize every artifact (the bench entry's body):
    releases the store first so the timing is a true cold build, then
    forces each artifact end-to-end with a count. Returns row counts.

    The five builds are INDEPENDENT row-local passes over two base
    tables, so they run from a small thread pool (guide §2.6): each
    build's scan is a single tiny-file task locally (and a modest task
    set per table at scale), so sequential counts left most cores idle
    while paying five driver planning gaps back-to-back. Overlapping
    2-3 jobs back-fills both. Measured (sf0.1, local[32], interleaved
    min-of-4): 4.34 s sequential -> 1.97 s overlapped; adding a
    repartition spread of the docs scan on top changed nothing
    (1.94 s), so the artifacts' partitioning — and every consumer's
    plan — stays untouched. Artifacts are bit-identical either way
    (row-local deterministic maps; the memo registry is lock-guarded
    for the bookkeeping only, builds overlap outside the lock)."""
    release_shared_artifacts()

    def _count(name, df_fn):
        return name, df_fn().count()

    jobs = (
        ("rolling_hashes", lambda: shared_rolling_hashes(spark, sf_dir, k)),
        ("minhash_sigs", lambda: shared_minhash_sigs(spark, sf_dir)),
        (
            "minhash_sigs_xxh",
            lambda: shared_minhash_sigs(
                spark, sf_dir, hash_family="xxhash64"
            ),
        ),
        ("token_sets", lambda: shared_token_sets(spark, sf_dir)),
    )
    out = {}
    with ThreadPoolExecutor(max_workers=3) as pool:
        futs = [pool.submit(_count, n, fn) for n, fn in jobs]
        # vector-side driver literal: the one centroid spec with timed
        # consumers (see shared_kmeans_centroids' accounting note; the
        # k=8 here is the quantizer's cell count, unrelated to the gram
        # size ``k`` parameter above). Submitted alongside the counts —
        # Lloyd's per-iteration collects are independent of the doc-side
        # artifact builds.
        cents_fut = pool.submit(
            lambda: shared_kmeans_centroids(spark, sf_dir, k=8, iterations=3)
        )
        for f in futs:
            name, n = f.result()
            out[name] = n
        _, cents = cents_fut.result()
    out["kmeans_centroids"] = len(cents)
    return out
