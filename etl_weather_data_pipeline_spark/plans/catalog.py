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
# file holds exactly the first 50 registry entries). Round-13 rotation
# (executes the r12 verdict directive #1 name-for-name): (1) the
# r10-vintage cohort (last green = CORRECTNESS_r10, age 3 at r13) — 47
# rotating rows minus the 5 rows retired into the r12 consolidation
# batteries minus the 2 rows retired into THIS round's battery (see cap
# math below) = 40 rows, JVM-only plans first, the heavyweight
# curation/export pipelines at the cohort tail (a worker death late in
# the window costs the fewest rows); (2) the three consolidation
# batteries' FIRST driver checks (nation_set_ops_battery +
# orders_grouping_battery from r12, customer_semi_anti_battery from
# r13 — constituents retired with green-r10 evidence, batteries
# parity-exact in the green suite); (3) three EARLY PULLS from the
# r11 vintage to smooth r14 (the r12 pre-plan's suggested pulls
# top_revenue_orders/nation_revenue are in fact r10-vintage — already
# due — so the cheapest true r11 rows pull instead:
# orders_monthly_growth, source_quality_stats, corpus_length_histogram);
# (4) the standing canaries kmeans_clusters + corpus_merge_state and
# the reference-parity core weather_pipeline_e2e; (5) the round's ONE
# debutant dead-LAST (corpus_attach_judge_semantic — stage 4 of the
# attach judge, r12 verdict directive #2). 40+3+3+3+1 = exactly 50.
# Rotation-debt policy (standing, r11 directive #2): 50 slots/round − 3
# fixed (canaries + e2e) = 47 rotating slots/round = 141 rotating rows
# per 3-round cycle. Registry capped at 141 (138 rotating + 3 fixed) =
# at most ONE debutant per round, funded by consolidation. r13 cap
# math: 141 − 2 (customers_with_big_orders + customers_without_orders
# -> customer_semi_anti_battery, identical left_semi/left_anti
# coverage) + 1 (battery) + 1 (debutant) = 141. Cap held.
# Banking plan (r14, pre-planned): the r11-vintage cohort (47 rotating
# rows green r11) minus the 3 early pulls above minus the 2 rows
# retired into the r14-funding battery (ann_pq_topk + ann_pq_multi_topk
# -> ann_pq_topk_battery — identical PQ operator surface, labeled
# branches, ONE shared encode pass where the two rows each paid their
# own) = 42 rows MUST open the r14 window; + the battery's FIRST
# driver check + canaries + e2e = 46 slots -> r14 budget = the
# PRE-BUILT debutant corpus_store_maintenance dead-last
# (backfill_winnow_fingerprints + compact_corpus_side_tables lifecycle
# — the r13 pre-plan's nomination, built/parity-exact/invariant-green
# at sf0.1 within r13) + 3 early pulls from the r12 vintage
# (suggested: global_order_metrics, top_orders_per_customer,
# user_running_value — the cheapest r12 rows). r13's own window (this
# list) banks until r16. Cap math (held): 141 - 2 (PQ rows) + 1
# (battery) + 1 (corpus_store_maintenance) = 141; both new rows sit
# BELOW the first-50 boundary so the pre-planned r13 window above is
# untouched.
# Changed-code note (r13): merge_batch_neardup_into_corpus gained the
# optional semantic_bootstrap_centroids pass-through (default None =
# unchanged batch-trained bootstrap; exercised only by the debutant,
# which sits in this window) and corpus_training_export's finally now
# releases its temp-store cache (the query sits in this window's
# cohort tail, so the change gets its driver re-check this round).
_DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # --- the 40-row r10-vintage cohort (age 3 at r13), JVM-light first
    "top_revenue_orders",
    "nation_revenue",
    "segment_order_stats",
    "brand_part_stats",
    "user_sessions",
    "latest_event_per_user",
    "dedup_events_hourly",
    "daily_event_type_pivot",
    "customer_string_battery",
    "conditional_aggs",
    "daily_counts_unpivot",
    "events_anomaly_zscore",
    "events_mad_outliers",
    "events_mad_outliers_approx",
    "events_zorder_layout",
    "weather_daily_summary",
    "weather_latest",
    "weather_seasonal_trends",
    "weather_quality_metrics",
    "doc_dedup_exact",
    "doc_duplicate_groups",
    "doc_minhash_signatures",
    "doc_simhash",
    "doc_simhash_pairs",
    "doc_winnow_overlap_pairs",
    "doc_passage_pairs_blocked",
    "dedup_recall_probe",
    "passage_recall_probe",
    "corpus_ingest_history_report",
    "corpus_mixture_plan",
    "neardup_cluster_keep",
    "corpus_curriculum_stages",
    "corpus_epoch_expand",
    "neardup_transitivity_stats",
    "corpus_pack_intact",
    "corpus_pack_stats",
    "ann_ivf_index_topk",
    "corpus_bpe_merges",
    # cohort tail: heavyweight flagship + Python-worker consumer
    "corpus_curation_pipeline",
    "corpus_training_export",
    # --- consolidation batteries' FIRST driver checks ---
    "nation_set_ops_battery",
    "orders_grouping_battery",
    "customer_semi_anti_battery",
    # --- early pulls from the r11 vintage (smooth r14) ---
    "orders_monthly_growth",
    "source_quality_stats",
    "corpus_length_histogram",
    # --- standing canaries + reference-parity core ---
    "kmeans_clusters",
    "corpus_merge_state",
    "weather_pipeline_e2e",
    # --- r13 debutant dead-LAST (semantic-attach judge, directive #2)
    "corpus_attach_judge_semantic",
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
