#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <sf>, "runs_per_query": N}

Each query is forced end-to-end with the noop sink (full computation, no
driver-side collect cost). Per-query numbers are the MIN of
$SPARK_GRAFT_RUNS (default 3) back-to-back runs after a JVM warmup pass:
a 3-run variance study on identical code measured 47% peak-to-trough
host noise on single-shot timings (README "Benchmark comparability
across rounds"), so cross-round totals are only signal on minima.
BENCH_CALLABLES are timed single-shot; the WARM_CALLABLES subset gets
one untimed sf0.001 pass first (see the WARM_CALLABLES comment).

The line also carries "core_r6_value": the total over the FROZEN
round-6 31-query core — the like-for-like number across rounds (the
full total grows with every added headliner). BENCH_CALLABLES entries
(the streaming funnel sink) are timed single-shot, unwarmed — they are
hundreds-of-jobs pipelines whose relative noise is small, and min-of-N
on a ~45s pipeline would triple the bench's wall clock.

Artifact-store accounting (r11, verdict directive #1): the dedup /
passage / probe / funnel queries derive their per-document map work
(rolling-hash arrays, MinHash signatures, token sets) from the
session-persistent artifact store (plans/artifacts.py) — the tables a
production pipeline maintains once per corpus version. Their per-query
numbers therefore measure INCREMENTAL cost given the store; the cold
build itself is timed explicitly as the `corpus_artifacts_build` entry
(single-shot, releases-then-rebuilds), so the one-time cost appears in
the total exactly once. This also makes `core_r6_value` step down
discontinuously at r11 — compare r11+ cores to each other, and add
`corpus_artifacts_build` when comparing against r10 and earlier.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from etl_weather_data_pipeline_spark.plans.catalog import build_registry
from etl_weather_data_pipeline_spark.session import get_spark

HEADLINE = [
    # relational core
    "pricing_summary",
    "top_revenue_orders",
    "nation_revenue",
    "segment_order_stats",
    # windows / sessions / dedup
    "latest_event_per_user",
    "user_sessions",
    "dedup_events_hourly",
    # LLM-data ops
    "doc_dedup_exact",
    "doc_minhash_lsh_pairs",
    "doc_minhash_lsh_pairs_xxh",  # xxhash64 family: records the md5 delta
    "doc_jaccard_pairs",
    "doc_text_stats",
    "ann_cosine_topk",
    # heaviest round-2 additions — regression-visible from round 3 on
    "doc_winnow_fingerprints",
    "doc_neardup_clusters",
    "doc_tfidf_top_terms",
    # round-3 batch 2: ingest dedup + packing (the periodic-pipeline ops)
    "doc_incremental_dedup",
    "corpus_sequence_pack",
    # round-4: winnow overlap, source drift, dim stats, novelty
    "doc_winnow_overlap_pairs",
    "source_token_kl",
    "embedding_dim_stats",
    "doc_ngram_novelty",
    # round-5: DSIR importance weights (persisted vocab LM + scoring join)
    # + exact passage pairs (gram-position self-join, gaps-and-islands)
    "dsir_importance_weights",
    "doc_exact_passage_pairs",
    # round-6: the sketch-blocked passage composition (the 100 TB path:
    # 184x fewer gram-match rows than the standalone join at sf0.1;
    # wall-clock parity at this SF, diverges with duplication density), the
    # periodic-ingest incremental funnel, and the planted-duplicate
    # recall probe (one dedup-run's cost, by design — keep it that way)
    "doc_passage_pairs_blocked",
    "corpus_dedup_funnel_incremental",
    "dedup_recall_probe",
    # round-7: the planted-passage recall probe (stage-3 blocking
    # calibration; one blocked-dedup-run's cost over a 1.4x corpus) and
    # CDC sub-document chunk dedup (map-side chunking, two shuffles)
    "passage_recall_probe",
    "doc_cdc_chunk_dedup",
    # flagships: full weather transform pipeline + corpus curation chain
    # + the three-stage dedup funnel (exact -> near-dup -> passage)
    "weather_pipeline_e2e",
    "corpus_curation_pipeline",
    "corpus_dedup_funnel",
    # the production-shaped funnel: stage 3 via the blocked composition
    # (identical survivors at sf0.01; wall-clock parity with the exact
    # funnel at test SFs — inside cross-session noise — the scale claim
    # is the 184x pinned gram-match volume reduction)
    "corpus_dedup_funnel_blocked",
    # round-8: v2 of the curation flagship (dedup -> near-dup -> LM
    # band -> fitted-classifier filter)
    "corpus_curation_pipeline_v2",
    # round-13: trained-IVF probe — one of the two timed consumers of
    # the session centroid memo (plans/artifacts.py
    # shared_kmeans_centroids k=8 i=3; the other is the
    # semantic_attach_judge callable below). The Lloyd build itself is
    # charged once inside corpus_artifacts_build, so this entry times
    # the INCREMENTAL probe cost given the memo — the build-counter pin
    # (tests/test_plans.py) proves both consumers share one training
    # pass.
    "ann_ivf_trained_topk",
]


def _bench_streaming_funnel_2batch(spark, sf_dir):
    """Bounded two-batch streaming-funnel sink measurement (r7 verdict
    directive #6): bootstrap a fresh store with half the corpus through
    the full three-stage merge, then merge the WHOLE corpus against it —
    the steady-state shape (a batch probing an existing store through
    exact + band + winnow stages). The full driver-oracled
    corpus_funnel_merge_state (3 merges + replay) runs 70s at sf0.1 —
    too heavy for the min-of-N loop — so this twin is timed SINGLE-SHOT
    (see the timing loop: it is a many-hundred-job pipeline, so its
    relative noise is far below a 0.5s query's)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from etl_weather_data_pipeline_spark.plans.catalog import load
    from etl_weather_data_pipeline_spark.streaming.corpus import (
        bands_table_name,
        merge_batch_neardup_into_corpus,
        winnow_table_name,
    )

    tmp = tempfile.mkdtemp(prefix="bench_funnel_")
    store = tmp + "/store"
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    try:
        merge_batch_neardup_into_corpus(
            docs.filter(F.col("doc_id") % 2 == 0),
            store,
            band_buckets=8,
            passage_min_run=16,
        )
        merge_batch_neardup_into_corpus(
            docs, store, band_buckets=8, passage_min_run=16
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {bands_table_name(store)}")
        spark.sql(f"DROP TABLE IF EXISTS {winnow_table_name(store)}")
        # ~1.5x-corpus parquet + side tables per run — never leak it
        shutil.rmtree(tmp, ignore_errors=True)


def _bench_corpus_artifacts_build(spark, sf_dir):
    """Cold build of the session corpus-artifact store
    (plans/artifacts.py: rolling-hash arrays, MinHash signatures,
    token sets over the raw documents table) — the one-time cost the
    rewired dedup/passage/probe queries amortize (r10 verdict
    directive #1). build_all releases the store first, so this entry
    times a true cold build; per-query numbers elsewhere in this run
    measure incremental cost GIVEN the store, so the total charges the
    build exactly once — production accounting."""
    from etl_weather_data_pipeline_spark.plans.artifacts import build_all

    build_all(spark, sf_dir, k=8)


def _bench_ann_index_drift_retrain(spark, sf_dir):
    """Index-maintenance path timing (r11 verdict directive #6): the
    full drift lifecycle — biased-bootstrap IVF build, map-only adds,
    per-cell skew/energy audit, warm-start retrain + staged swap,
    post-swap re-audit + assign-consistency recompute. Runs the
    registry query (so bench and gate measure the same code) and
    asserts its invariant booleans — a retrain/audit cost regression or
    a broken invariant is now bench-visible, not only gate-visible."""
    from etl_weather_data_pipeline_spark.plans.llmops import (
        ann_index_drift_report,
    )

    row = ann_index_drift_report(spark, sf_dir).first()
    assert row["retrain_preserves_rows"] and row["energy_not_worse"], row


def _bench_semdedup_global_audit(spark, sf_dir):
    """Corpus-global SemDeDup audit timing (r11 verdict directive #6):
    store build + adds + retrain + multi-probe blocked re-judge with
    exact cosine verify and the planted-pair recall floor."""
    from etl_weather_data_pipeline_spark.plans.llmops import (
        corpus_semdedup_global,
    )

    row = corpus_semdedup_global(spark, sf_dir).first()
    assert row["planted_recall_floor_ok"], row


def _bench_semantic_attach_judge(spark, sf_dir):
    """Semantic-attach lifecycle timing (r12 verdict directives #2/#6):
    the full read-only re-curation shape — store build through the
    4-stage merge sink with the memoized offline quantizer frozen in,
    judge_batch_against_store with the semantic stage active (map-only
    assign to the frozen cells + partition-pruned index probe), then
    the judge==merge equivalence merge. Runs the registry query (bench
    and gate measure the same code) and asserts its invariants; the
    second timed consumer of the k=8 centroid memo (with
    ann_ivf_trained_topk in HEADLINE) — the Lloyd build is charged
    once inside corpus_artifacts_build."""
    from etl_weather_data_pipeline_spark.plans.llmops import (
        corpus_attach_judge_semantic,
    )

    row = corpus_attach_judge_semantic(spark, sf_dir).first()
    assert (
        row["judge_matches_merge"]
        and row["judge_wrote_nothing"]
        and row["planted_recall_floor_ok"]
        and row["centroids_from_memo"]
    ), row


# Timed callables that are not registry queries (side-effecting sinks /
# store builds) plus action-performing maintenance pipelines.
# Single-shot (not min-of-N) — noted per entry.
BENCH_CALLABLES = {
    "corpus_artifacts_build": _bench_corpus_artifacts_build,
    "ann_index_drift_retrain": _bench_ann_index_drift_retrain,
    "semdedup_global_audit": _bench_semdedup_global_audit,
    "semantic_attach_judge": _bench_semantic_attach_judge,
    "streaming_funnel_sink_2batch": _bench_streaming_funnel_2batch,
}

# Callables that get one UNTIMED warmup pass at the smallest SF before
# the timed single shot. The r12 debutants' first-ever run pays ~7-12s
# of codegen/classloading the HEADLINE warmup never exercises
# (partitioned index writes, staged swaps, retrain plans) — measured
# 22.0s cold vs 8.0/8.5s on the next two runs in one session — so the
# unwarmed single shot was mostly measuring JVM state, not the
# pipeline. The two LEGACY single-shots (artifacts build, funnel sink)
# stay unwarmed: their r7-r11 artifact series was recorded that way
# and a mid-series methodology change would read as a speedup.
WARM_CALLABLES = (
    "ann_index_drift_retrain",
    "semdedup_global_audit",
    "semantic_attach_judge",
)

# Frozen like-for-like core (= the round-6 headline set, the baseline of
# every cross-round comparison since): the FULL headline total grows as
# headliners are added (47.6s -> 56.6s across r6->r7 reads as a
# regression until decomposed), so the JSON line carries a second total
# over this frozen set. Do NOT grow this list — its only value is that
# it never changes.
CORE_R6 = [
    "pricing_summary",
    "top_revenue_orders",
    "nation_revenue",
    "segment_order_stats",
    "latest_event_per_user",
    "user_sessions",
    "dedup_events_hourly",
    "doc_dedup_exact",
    "doc_minhash_lsh_pairs",
    "doc_minhash_lsh_pairs_xxh",
    "doc_jaccard_pairs",
    "doc_text_stats",
    "ann_cosine_topk",
    "doc_winnow_fingerprints",
    "doc_neardup_clusters",
    "doc_tfidf_top_terms",
    "doc_incremental_dedup",
    "corpus_sequence_pack",
    "doc_winnow_overlap_pairs",
    "source_token_kl",
    "embedding_dim_stats",
    "doc_ngram_novelty",
    "dsir_importance_weights",
    "doc_exact_passage_pairs",
    "doc_passage_pairs_blocked",
    "corpus_dedup_funnel_incremental",
    "dedup_recall_probe",
    "weather_pipeline_e2e",
    "corpus_curation_pipeline",
    "corpus_dedup_funnel",
    "corpus_dedup_funnel_blocked",
]


# Property-oracle queries whose correctness is an in-query INVARIANT
# (booleans computed against exact cross-checks) rather than a value
# hash. The driver's gate runs them at sf0.01; invariants can be
# scale-dependent (the ann self-recall floor once broke only at sf0.1),
# so `--check-invariants` re-asserts every boolean column at the bench
# SF. The merge-state queries carry their invariant as an internal
# raise (replay idempotency inside the foreachBatch replay) instead of
# a column — running them at the bench SF IS the assertion.
PROPERTY_QUERIES = [
    "approx_aggregates",
    "events_mad_outliers_battery",
    "kmeans_clusters",
    "ann_ivf_topk",
    "ann_ivf_trained_topk",
    "ann_ivf_index_topk",
    "ann_pq_topk_battery",
    "ann_ivfpq_topk",
    "ann_ivfpq_residual_topk",
    "corpus_bpe_merges",
    "corpus_bpe_apply",
    "corpus_training_export",
    "doc_quality_classifier",
    "corpus_curation_pipeline_v2",
    "embedding_semdedup_probe",
    "ann_index_drift_report",
    "corpus_semdedup_global",
    "corpus_merge_state",
    "corpus_neardup_merge_state",
    "corpus_funnel_merge_state",
    "corpus_dedup_funnel_attached",
    "corpus_attach_judge_semantic",
    # corpus_store_maintenance is deliberately NOT a timed headline
    # entry (r13 verdict directive #3, decided r14): the headline
    # already carries two lifecycle single-shots plus the ~17 s
    # semantic-attach judge, and this query's wall clock at test SF is
    # five merge/judge fixed floors stacked (store build x2, judge x3)
    # — a third lifecycle single-shot would add ~12-15 s of
    # floor-dominated ballast with no scale signal the volume/plan pins
    # (single-winnow-scan per merge, fused audits) don't already carry.
    # Its invariants still run at bench SF right here, every round.
    "corpus_store_maintenance",
    # corpus_crash_recovery_audit (the pre-built r15 debutant) follows
    # the same rule: property booleans at bench SF here, no timed entry
    # (another floor-dominated lifecycle single-shot would be ballast).
    "corpus_crash_recovery_audit",
    "doc_minhash_lsh_pairs_xxh",
]

# Queries whose invariant is an internal raise, not boolean columns.
RAISE_INVARIANT_QUERIES = {
    "corpus_merge_state",
    "corpus_neardup_merge_state",
    "corpus_funnel_merge_state",
}


def check_invariants(spark, registry, sf_dir: str) -> dict[str, str]:
    """Run the property-oracle queries at ``sf_dir`` and assert every
    boolean column is TRUE on every row. Returns {query: "ok"} or raises
    AssertionError naming the first violated invariant."""
    from pyspark.sql.types import BooleanType

    results: dict[str, str] = {}
    for name in PROPERTY_QUERIES:
        df = registry[name].spark(spark, sf_dir)
        bool_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, BooleanType)
        ]
        if name not in RAISE_INVARIANT_QUERIES:
            assert bool_cols, (
                f"{name}: no boolean invariant columns — schema drifted?"
            )
        rows = df.collect()
        assert rows, f"{name}: returned no rows at {sf_dir}"
        for r in rows:
            for c in bool_cols:
                assert r[c] is True, (
                    f"{name}: invariant {c} violated at {sf_dir}: {r}"
                )
        results[name] = "ok"
    return results


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)
    # SPARK_GRAFT_QUERIES=a,b,c restricts the run to a subset — used for
    # like-for-like comparisons against earlier rounds whose headline set
    # was smaller (growing the set inflates the total and the shared-JVM
    # GC/cache pressure, so cross-round totals are only comparable on the
    # intersection).
    subset = os.environ.get("SPARK_GRAFT_QUERIES")
    headline = (
        [q.strip() for q in subset.split(",") if q.strip()]
        if subset
        else HEADLINE
    )

    spark = get_spark("bench", cpus=cpus, shuffle_partitions=cpus)
    registry = build_registry()

    if "--check-invariants" in sys.argv:
        results = check_invariants(spark, registry, sf_dir)
        print(
            json.dumps(
                {
                    "metric": "property_invariants",
                    "value": len(results),
                    "unit": "queries_ok",
                    "queries": results,
                    "sf": sf,
                }
            )
        )
        return

    # Warm the JVM: run every headline query once at the smallest SF so
    # whole-stage-codegen compilation and classloading land outside the
    # timed runs (plans are structurally identical across SFs → codegen
    # cache hits). Timings below are steady-state per-query wall clock.
    from etl_weather_data_pipeline_spark.plans.llmops import (
        release_curation_cache,
    )

    warm_dir = "/root/testdata/sf0.001"
    # Names that actually received an untimed warmup pass this run —
    # emitted in the JSON line (r12 verdict directive #5 + r12 advice):
    # a WARM_CALLABLES entry timed with the warmup silently skipped
    # (missing warm_dir, or benching AT the warm SF) pays the ~7-12s
    # cold codegen/classloading penalty, and without the field such a
    # cold reading is indistinguishable from a warmed one.
    warmed: list[str] = []
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in [n for n in headline if n not in BENCH_CALLABLES]:
            registry[name].spark(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            warmed.append(name)
        for name in WARM_CALLABLES:
            if not subset or name in headline:
                BENCH_CALLABLES[name](spark, warm_dir)
                warmed.append(name)
        release_curation_cache()
    else:
        print(
            f"bench: warmup pass SKIPPED (warm_dir={warm_dir} missing "
            "or == sf_dir) — all entries below are COLD readings",
            file=sys.stderr,
        )

    n_runs = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))
    # Multi-second queries get two EXTRA runs beyond $SPARK_GRAFT_RUNS
    # (r10 verdict directive #1b): sub-second queries' absolute noise is
    # bounded by their size, but a 47%-band outlier on a 5 s query moves
    # the headline by seconds — min-of-5 on exactly those floors it at
    # ~2 s of extra wall-clock per query, none of it reported.
    extra_if_slow = int(os.environ.get("SPARK_GRAFT_EXTRA_SLOW_RUNS", "2"))
    slow_threshold_s = 1.5
    timings: dict[str, float] = {}
    for name in [n for n in headline if n not in BENCH_CALLABLES]:
        q = registry[name]
        best = float("inf")
        runs = n_runs
        done = 0
        while done < runs:
            # Queries that persist an intermediate (winnow overlap, the
            # curation flagship) release + rebuild their cache on every
            # invocation, so each run re-computes from the scan — min-of-N
            # measures cold compute, not cache hits.
            t0 = time.monotonic()
            q.spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.monotonic() - t0)
            done += 1
            if done == n_runs and best >= slow_threshold_s:
                runs = n_runs + extra_if_slow
        timings[name] = round(best, 3)
    # Side-effecting sink benchmarks: single-shot by design — each is a
    # multi-stage pipeline of hundreds of jobs, so per-entry noise is a
    # few percent, not the 47% single-shot band of sub-second queries,
    # and a min-of-N here would triple the bench's wall clock. With a
    # subset, run exactly the callables the subset names (so
    # SPARK_GRAFT_QUERIES=streaming_funnel_sink_2batch works for
    # interleaved A/B on the sink alone).
    wanted_callables = (
        [n for n in headline if n in BENCH_CALLABLES]
        if subset
        else list(BENCH_CALLABLES)
    )
    # r15 DECLARED methodology transition (r14 verdict directive #7,
    # additions-only): the two LEGACY single-shots keep their unwarmed
    # first-shot series in `queries` (so the r7-r14 artifact series
    # stays like-for-like), and ALSO run a second back-to-back pass
    # reported under the NEW `warmed_single_shot` field — the warmed
    # series future rounds can compare on without the ±30% cold-JVM
    # single-shot band that produced r14's false regression flags.
    # The warm run is timed work on fresh inputs (build_all releases
    # and rebuilds the store; the funnel sink builds a fresh tmp
    # store), never a cache read. `value`/`queries` totals are
    # untouched.
    legacy_transition = (
        "corpus_artifacts_build",
        "streaming_funnel_sink_2batch",
    )
    warmed_single_shot: dict[str, float] = {}
    for name in wanted_callables:
        t0 = time.monotonic()
        BENCH_CALLABLES[name](spark, sf_dir)
        timings[name] = round(time.monotonic() - t0, 3)
        if name in legacy_transition:
            t0 = time.monotonic()
            BENCH_CALLABLES[name](spark, sf_dir)
            warmed_single_shot[name] = round(time.monotonic() - t0, 3)
    release_curation_cache()
    from etl_weather_data_pipeline_spark.plans.artifacts import (
        release_shared_artifacts,
    )

    release_shared_artifacts()

    total = round(sum(timings.values()), 3)
    core = [n for n in CORE_R6 if n in timings]
    core_total = round(sum(timings[n] for n in core), 3)
    full_line = json.dumps(
        {
            "metric": "headline_queries_total_wall_clock",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "runs_per_query": n_runs,
            # queries whose min after runs_per_query runs was still
            # >= 1.5 s got this many EXTRA runs (noise flooring)
            "extra_runs_if_slow": extra_if_slow,
            # like-for-like across rounds: the frozen r6 core set
            # (the full total grows with every added headliner)
            "core_r6_value": core_total,
            "core_r6_n_queries": len(core),
            # entries timed SINGLE-SHOT (side-effecting sink
            # pipelines, outside the min-of-N loop and the core) —
            # decompose the total with these before comparing it
            # to min-of-N numbers.
            "single_shot": [n for n in timings if n in BENCH_CALLABLES],
            # per-entry methodology (r12 verdict directive #5, r13
            # verdict directive #2): timed entries that did NOT get an
            # untimed warmup pass this run — the complement form of
            # r13's "warmed" list, which at ~38 names pushed the line
            # past the driver's 2000-char stdout tail window and
            # clipped the head (BENCH_r13 "parsed": null). warmed =
            # every timed entry except these. An unwarmed entry was
            # timed cold (~7-12s codegen penalty on its first-ever
            # plans) — compare cross-round numbers accordingly. The
            # legacy single-shots (artifacts build, funnel sink) are
            # unwarmed BY DESIGN to preserve their r7-r12 series.
            "unwarmed": [n for n in timings if n not in warmed],
            "n_warmed": sum(1 for n in timings if n in warmed),
            # r15 transition series (see the legacy_transition comment):
            # second back-to-back run of the two legacy single-shots —
            # the warmed numbers, NOT included in value/queries.
            "warmed_single_shot": warmed_single_shot,
        }
    )
    print(full_line)
    # Machine-recoverable summary, printed LAST (r13 verdict directive
    # #2): the driver captures only the final 2000 chars of stdout
    # (measured from BENCH_r13's recorded tail), so a >2000-char
    # per-query line gets its HEAD — including the total — clipped,
    # and a short line printed BEFORE it would sit entirely outside
    # the window. Last position guarantees the summary is intact in
    # the tail regardless of how large the per-query line grows;
    # tests/test_invariants_bench_sf.py::
    # test_bench_summary_line_fits_tail_window pins its length far under the
    # window. Full per-query data: the line above (tail-truncated at
    # the head if oversized) — set SPARK_GRAFT_BENCH_OUT=<path> to
    # also write it to a file in full.
    print(summary_line(total, core_total, len(timings), len(core), sf))
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT")
    if out_path:
        with open(out_path, "w") as f:
            f.write(full_line + "\n")


def summary_line(
    total: float, core_total: float, n_queries: int, n_core: int, sf: float
) -> str:
    """The short trailing JSON line — everything a round-over-round
    comparison needs even when the per-query line outgrows the driver's
    tail capture. Keys mirror the full line's names where they overlap
    (value/unit/sf/core_r6_value) so downstream parsers need no
    special-casing."""
    return json.dumps(
        {
            "metric": "bench_summary",
            "value": total,
            "unit": "sec",
            "total": total,
            "core_r6_value": core_total,
            "core_r6_n_queries": n_core,
            "n_queries": n_queries,
            "sf": sf,
        }
    )


if __name__ == "__main__":
    main()
