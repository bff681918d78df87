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
# file holds exactly the first 50 registry entries). Round-9 rotation
# (executes the r8 verdict directive #1): (1) queries whose code changed
# this round (embedding_semdedup_probe: scaled k + pair-volume
# invariant; the three merge-state queries over the r9 streaming merge
# amortization) and the round's NEW ann_ivf_trained_topk, then (2) the
# FIVE r5-vintage rows the r8 verdict ordered rotated first
# (pricing_summary, approx_aggregates, ann_cosine_topk,
# doc_neardup_clusters, doc_winnow_fingerprints — age 4 at r9 if
# deferred again), then (3) 37 of the 44 r6-vintage rows (age 3 at r9,
# the boundary — everything not re-greened now breaches at r10), then
# (4) the standing canaries corpus_curation_pipeline +
# weather_pipeline_e2e (corpus_merge_state is in group 1 via the
# streaming changes), with the round's new mapInPandas debutant
# multimodal_frame_stats dead-LAST (worker-risk tail discipline: the
# round-1 harness died on the only mapInPandas query; in last place a
# repeat death costs no other query its row — and this one is the
# UNBANKED debutant, so it risks only itself).
# Deferred to r10 FIRST (the only r6 rows left out — all seven are
# bench-headline at sf0.1 every round AND mirror-verified every
# session, the lowest-marginal-evidence deferrals; age 4 at r10, so
# r10 MUST open with them): top_revenue_orders, nation_revenue,
# segment_order_stats, latest_event_per_user, user_sessions,
# dedup_events_hourly, doc_dedup_exact. After them r10 takes the
# 38-row r7 cohort (age 3 at r10) — 45 + canaries + e2e = 48 slots,
# leaving ~2 for r10's own changes; plan r10's new-query count
# accordingly. The r8 cohort (50 rows) banks until r11.
_DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # Changed this round — must re-green first:
    "embedding_semdedup_probe",
    "corpus_merge_state",  # standing canary, also streaming-changed
    "corpus_neardup_merge_state",
    "corpus_funnel_merge_state",
    # New this round:
    "ann_ivf_trained_topk",
    # The five r5-vintage rows (r8 verdict directive #1, rotate FIRST):
    "pricing_summary",
    "approx_aggregates",
    "ann_cosine_topk",
    "doc_neardup_clusters",
    "doc_winnow_fingerprints",
    # 37 of the 44 r6-vintage rows (the seven named above defer to r10):
    "global_order_metrics",
    "top_orders_per_customer",
    "user_running_value",
    "customer_running_spend",
    "events_enriched",
    "events_filtered_scored",
    "events_json_props",
    "median_value_by_type",
    "value_percentiles_by_type",
    "event_type_rollup",
    "daily_quality_summary",
    "type_value_buckets",
    "sliding_window_counts",
    "session_window_stats",
    "events_asof_orders",
    "events_range_join",
    "order_rankings",
    "skewed_type_stats",
    "doc_minhash_lsh_pairs",
    "doc_minhash_lsh_pairs_xxh",
    "doc_fingerprints",
    "doc_token_counts",
    "ann_ivf_topk",
    "doc_gopher_quality_flags",
    "embedding_semdedup_keep",
    "corpus_dataset_card",
    "doc_incremental_dedup",
    "doc_unigram_logprob",
    "source_token_kl",
    "embedding_dim_stats",
    "doc_ngram_novelty",
    "dsir_importance_weights",
    "doc_exact_passage_pairs",
    "corpus_dedup_funnel",
    "corpus_dedup_funnel_blocked",
    "corpus_dedup_funnel_incremental",
    "source_boilerplate_ngrams",
    # Standing canary + reference-parity core:
    "corpus_curation_pipeline",
    "weather_pipeline_e2e",
    # Dead-LAST on purpose (worker-risk tail): the round's new
    # mapInPandas debutant — a worker death here costs only its own,
    # previously-nonexistent, row.
    "multimodal_frame_stats",
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
