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
# file holds exactly the first 50 registry entries). Round-12 rotation
# (executes the r11 verdict directive #1 name-for-name): (1) the FULL
# 46-row r9-vintage cohort (last green = CORRECTNESS_r09, age 3 at r12),
# JVM-only plans first, the heavyweight merge-state/funnel pipelines
# late, and the lone Python-worker consumer (multimodal_frame_stats,
# mapInPandas) at the cohort tail (a worker death late in the window
# costs the fewest rows); (2) the standing canaries kmeans_clusters +
# corpus_merge_state (r11 verdict directive #8 names this pair
# explicitly; the r11 comment block had penciled corpus_curation_pipeline
# as second canary — it is r10-vintage, banks until r13 where it is due
# anyway and opens the r13 window) and the reference-parity core
# weather_pipeline_e2e; (3) the round's ONE debutant dead-LAST
# (corpus_dedup_funnel_attached — the attach-path funnel, r11 verdict
# directive #4). 46+3+1 = exactly 50 slots.
# Rotation-debt policy (r11 verdict directive #2, stated in COVERAGE.md):
# 50 slots/round − 3 fixed (canaries + e2e) = 47 rotating slots/round =
# 141 rotating rows per 3-round full-coverage cycle. Registry is capped
# at 141 (138 rotating + 3 fixed), leaving slack 3 per cycle = at most
# ONE debutant per round, sustainably. r12 enforces the cap by
# consolidation: nationkeys_union + nations_intersect +
# customer_only_nations -> nation_set_ops_battery, and orders_cube +
# orders_grouping_sets -> orders_grouping_battery (identical operator
# coverage, 5 rows -> 2); registry 143 − 5 + 2 + 1 debutant = 141.
# Banking plan (r13, pre-planned per directive #2): the r10-vintage
# cohort (47 rows green r10, age 3 at r13) loses its 5 retired rows =
# 42 rows MUST open the r13 window; + the 2 consolidation batteries
# (first driver check — their constituents retired with green-r10
# evidence and the batteries are parity-exact this session) + canaries
# (kmeans_clusters, corpus_merge_state) + weather_pipeline_e2e = 47
# slots -> r13 debutant budget = 1, with 2 spare slots for early pulls
# from the r11 vintage (suggested: top_revenue_orders, nation_revenue —
# the cheapest r11 rows — to smooth r14, which otherwise needs all 47
# r11-vintage rows). r12's own window (this list) banks until r15.
# Changed-code note (r12): kmeans_clusters, ann_ivf_trained_topk, and
# embedding_semdedup_probe were rewired onto the centroid memo
# (plans/artifacts.py shared_kmeans_centroids) and ann_index_drift_report
# gained the null-energy accounting — all four sit in THIS window
# (canary slot / r9 cohort / debutant-adjacent), so every rewire gets
# its driver re-check this round; interim exact evidence = the green
# tests/test_oracle_parity.py legs (both gate SFs, stricter than the
# driver's hash compare).
_DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # --- the 46-row r9-vintage cohort (age 3 at r12), JVM-only first ---
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
    "approx_aggregates",
    "doc_fingerprints",
    "doc_token_counts",
    "doc_unigram_logprob",
    "doc_gopher_quality_flags",
    "doc_minhash_lsh_pairs",
    "doc_minhash_lsh_pairs_xxh",
    "doc_incremental_dedup",
    "doc_neardup_clusters",
    "doc_winnow_fingerprints",
    "doc_ngram_novelty",
    "doc_exact_passage_pairs",
    "source_token_kl",
    "source_boilerplate_ngrams",
    "dsir_importance_weights",
    "corpus_dataset_card",
    "embedding_dim_stats",
    "embedding_semdedup_keep",
    "embedding_semdedup_probe",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_ivf_trained_topk",
    # cohort late block: heavyweight funnel/merge-state pipelines
    "corpus_dedup_funnel",
    "corpus_dedup_funnel_blocked",
    "corpus_dedup_funnel_incremental",
    "corpus_neardup_merge_state",
    "corpus_funnel_merge_state",
    # cohort tail: the Python-worker consumer (worker-risk tail)
    "multimodal_frame_stats",
    # --- standing canaries + reference-parity core ---
    "kmeans_clusters",
    "corpus_merge_state",
    "weather_pipeline_e2e",
    # --- r12 debutant dead-LAST (attach-path funnel, directive #4) ---
    "corpus_dedup_funnel_attached",
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
