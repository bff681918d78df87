"""Query catalog: named queries with DuckDB-oracle mirrors.

Each :class:`Query` pairs a Spark DataFrame plan with the equivalent ANSI
SQL the driver runs through DuckDB on the same parquet tables. The pair is
the correctness contract: identical column names, identical row sets,
bit-identical values.

Cross-engine determinism rules used throughout (established empirically,
see tests/test_oracle_parity.py):

- **Float aggregates go through exact decimals.** Spark and DuckDB sum
  doubles in different orders → last-ulp drift → hash mismatch. Pattern:
  ``CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)`` on both sides — exact
  decimal arithmetic, deterministic double at the end.
- **Rounding doubles goes through decimal too.** Spark ``round`` is
  HALF_UP on the shortest decimal repr; DuckDB rounds the binary value —
  they disagree on ties. ``ROUND(CAST(x AS DECIMAL(28,10)), n)`` agrees
  bit-for-bit (verified incl. negatives).
- **events.ts is parquet TIMESTAMP(NANOS)** — Spark can't read it natively;
  ``load()`` reads nanos as long and floor-divides to micros, matching
  DuckDB 1.x's truncation to TIMESTAMP (µs).
- Every computed column is aliased identically in both plans (the driver
  sorts columns by name before hashing).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Query:
    name: str
    description: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = field(default=())


def ensure_worker_imports(spark: SparkSession) -> None:
    """Ship this package to Python workers via addPyFile.

    The driver may import us from an arbitrary path (sys.path hack in
    __spark_entry__); executor Python workers don't inherit that path, so
    any pickled-by-reference UDF would hit ModuleNotFoundError. Zipping the
    package once per process and addPyFile-ing it makes every UDF safe.
    """
    if getattr(spark, "_etl_pyfiles_added", False):
        return
    import tempfile
    import zipfile
    from pathlib import Path

    pkg_dir = Path(__file__).resolve().parent.parent
    zpath = Path(tempfile.gettempdir()) / (
        f"etl_weather_data_pipeline_spark_{os.getpid()}.zip"
    )
    if not zpath.exists():
        tmp = zpath.with_suffix(".tmp")
        with zipfile.ZipFile(tmp, "w") as z:
            for p in sorted(pkg_dir.rglob("*.py")):
                z.write(p, p.relative_to(pkg_dir.parent))
        tmp.replace(zpath)
    spark.sparkContext.addPyFile(str(zpath))
    spark._etl_pyfiles_added = True


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a testdata table; normalizes events.ts (nanos → micros)."""
    ensure_worker_imports(spark)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        # The driver has shipped events.ts both as INT64 nanos (rounds
        # 1-3) and as a real timestamp[us] (round 4 regeneration), so the
        # nanos->micros conversion is CONDITIONAL on the physical type —
        # unconditional conversion breaks whichever vintage it wasn't
        # written for (every events/weather query, both SFs).
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --- Spark-side deterministic-float helpers ---------------------------------


def dsum(col: str | Column, scale: int = 2, prec: int = 8) -> Column:
    """Exact decimal sum, returned as double (deterministic cross-engine).

    Input precision defaults to 8 so the sum's result type (precision+10 =
    18) stays on Spark's long-backed Decimal fast path — measured 2.5x
    faster than decimal(18,s) inputs, within 1.5x of raw double sums.
    Values must fit 10^(prec-scale) (here < 10^6 at scale 2; all testdata
    measures are < 10^6); larger magnitudes must pass prec explicitly — an
    out-of-range value fails LOUDLY (ANSI mode, Spark 4 default, raises
    NUMERIC_VALUE_OUT_OF_RANGE; verified by probe) rather than truncating.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({prec},{scale})")).cast("double")


def davg(col: str | Column, scale: int = 2, prec: int = 8) -> Column:
    """Deterministic mean: exact decimal sum / count (assumes no nulls)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({prec},{scale})")).cast("double") / F.count(
        F.lit(1)
    )


def dround(col: Column, n: int) -> Column:
    """Deterministic double rounding via decimal(28,10)."""
    return F.round(col.cast("decimal(28,10)"), n).cast("double")


# --- Oracle-side (DuckDB SQL) mirrors of the same helpers -------------------


def o_dsum(c: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({c} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def o_davg(c: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({c} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT(*)"


def o_dround(x: str, n: int) -> str:
    return f"CAST(ROUND(CAST({x} AS DECIMAL(28,10)), {n}) AS DOUBLE)"


# Registry order = the order the driver's correctness harness runs the
# queries, and the harness checks at most 50 per round (every CORRECTNESS
# file holds exactly the first 50 registry entries). Round-8 rotation
# (executes r7 verdict directive #2 — after this window every registry
# query's latest driver row is <= 3 rounds old): (1) queries whose code
# changed this round (doc_cdc_chunk_dedup narrow-shuffle rewrite;
# doc_quality_classifier f_len clamp + shared-weights memo; the PQ
# family over the refactored sampled-training pq_fit; the three
# merge-state queries over the bucket-marker + winnow-backfill streaming
# changes) and the round's NEW queries (corpus_curation_pipeline_v2,
# ann_ivfpq_residual_topk), then (2) the 36 banked rows deferred from r7
# (named at the r7 list's tail comment, see git history), then (3) the
# standing canary corpus_curation_pipeline (the other canary,
# corpus_merge_state, is in group 1 this round via the streaming
# changes) and weather_pipeline_e2e (reference-parity core).
# Python-worker / worker-risk queries sit at the window TAIL so a
# worker death costs no other query its row. Deferred to r9 (banked
# green + mirror-verified every session): the r4-vintage relational
# battery (orders_cube, orders_grouping_sets, daily_event_type_pivot,
# daily_counts_unpivot, customers_with_big_orders,
# customers_without_orders, customer_only_nations,
# customer_string_battery, nationkeys_union, nations_intersect,
# brand_part_stats, conditional_aggs, doc_simhash, doc_simhash_pairs,
# doc_minhash_signatures, doc_duplicate_groups — all re-greened r7),
# the weather family minus e2e (weather_daily_summary, weather_latest,
# weather_seasonal_trends, weather_quality_metrics), the events family
# (events_anomaly_zscore, events_mad_outliers,
# events_mad_outliers_approx, events_zorder_layout,
# events_filtered_scored and kin), and the r7 debutants
# (passage_recall_probe, corpus_mixture_plan, neardup_cluster_keep,
# corpus_curriculum_stages, corpus_bpe_merges, doc_bigram_logprob,
# corpus_epoch_expand, corpus_ingest_history_report, corpus_pack_intact,
# corpus_pack_stats, dedup_recall_probe, doc_passage_pairs_blocked,
# neardup_transitivity_stats, kmeans_clusters, doc_winnow_overlap_pairs)
# — all r7-green; property queries additionally re-assert at bench SF
# every round via --check-invariants regardless of the window.
_DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # Changed this round — must re-green first:
    "doc_cdc_chunk_dedup",
    "doc_quality_classifier",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_pq_multi_topk",
    "corpus_merge_state",  # standing canary, also streaming-changed
    "corpus_neardup_merge_state",
    "corpus_funnel_merge_state",
    # New this round (+ the bigram-LM report whose exact arithmetic the
    # v2 oracle reuses — green together or fail together):
    "corpus_curation_pipeline_v2",
    "ann_ivfpq_residual_topk",
    "corpus_bpe_apply",
    "corpus_decontaminate_eval",
    "neardup_threshold_sweep",
    "embedding_semdedup_probe",
    "doc_bigram_logprob",
    # The 36 rows deferred from r7 (oldest evidence in the registry);
    # multimodal_binary_features moved to the worker-risk tail:
    "embedding_neardup_pairs",
    "doc_jaccard_pairs",
    "doc_tfidf_top_terms",
    "doc_ngram_jaccard_pairs",
    "doc_text_stats",
    "doc_lang_id",
    "ann_multi_query_topk",
    "embedding_lsh_buckets",
    "doc_pii_scrub",
    "doc_stratified_sample",
    "label_centroids",
    "doc_minhash_jaccard_estimate",
    "doc_span_dedup",
    "doc_quality_quantile_filter",
    "embedding_quantize_stats",
    "neardup_degree_stats",
    "doc_repetition_stats",
    "corpus_length_histogram",
    "doc_chunk_spans",
    "corpus_sequence_pack",
    "corpus_temperature_sample",
    "neardup_cross_source_matrix",
    "corpus_shard_manifest",
    "source_quality_stats",
    "corpus_train_split",
    "doc_contamination_flags",
    "corpus_vocab_stats",
    # (ann_cosine_topk yields its slot to neardup_threshold_sweep —
    # like pricing_summary it is bench-headline + mirror-verified every
    # session; its r5 row is exactly 3 rounds old at r8, within the
    # evidence bound; r9 rotates it in.)
    "orders_monthly_growth",
    "user_retention_cohorts",
    "events_funnel_conversion",
    # (approx_aggregates, pricing_summary, ann_cosine_topk,
    # doc_winnow_fingerprints and doc_neardup_clusters yield their
    # slots to the round's debuting queries: each displaced row is
    # bench-headline or bench-SF-invariant-checked every round AND
    # mirror-verified every session — the lowest-marginal-evidence
    # deferrals, each with an r5 row exactly 3 rounds old at r8,
    # inside the evidence bound; r9 rotates all five in.)
    # Standing canary + reference-parity core:
    "corpus_curation_pipeline",
    "weather_pipeline_e2e",
    # Worker-risk tail (binary-column battery + the new mapInPandas
    # resize query; a worker death here costs no other query its row):
    "multimodal_binary_features",
    "multimodal_resize_stats",
    # Dead-LAST on purpose: the registry's only mapInPandas query once
    # killed the round-1 driver harness mid-window; in last place a
    # repeat death costs no other query its driver row. (Now fully
    # oracled — the deterministic decode stub is mirrored relationally.)
    "multimodal_decode_features",
)


def _released(q: Query) -> Query:
    """Wrap a query so each invocation FIRST releases the previous
    query's persisted intermediates (the bounded _CURATION_PERSISTED
    registry). Without this, a harness that runs the 50-query driver
    window back-to-back in one session accumulates every appending
    query's caches — a 1 GB-driver plain session OOM'd at window
    position 8 in an r8 replay. Releasing between queries is always
    SAFE: unpersist never invalidates results, it only forces a
    recompute if a caller re-collects an old DataFrame. Flagships that
    already self-release are unaffected (idempotent)."""
    from dataclasses import replace

    inner = q.spark

    def spark_with_release(spark, sf_dir):
        from etl_weather_data_pipeline_spark.plans.llmops import (
            release_curation_cache,
        )

        release_curation_cache()
        return inner(spark, sf_dir)

    return replace(q, spark=spark_with_release)


def build_registry() -> dict[str, Query]:
    """Assemble the full query registry from all plan modules."""
    from etl_weather_data_pipeline_spark.plans import (
        advanced,
        llmops,
        relational,
        weather_demo,
    )

    registry: dict[str, Query] = {}
    for mod in (weather_demo, relational, advanced, llmops):
        for q in mod.QUERIES:
            assert q.name not in registry, f"duplicate query name {q.name}"
            registry[q.name] = _released(q)
    missing = [n for n in _DRIVER_WINDOW_PRIORITY if n not in registry]
    assert not missing, f"priority queries absent from registry: {missing}"
    ordered = {n: registry[n] for n in _DRIVER_WINDOW_PRIORITY}
    ordered.update((n, q) for n, q in registry.items() if n not in ordered)
    return ordered
