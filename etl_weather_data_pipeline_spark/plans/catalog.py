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
# file holds exactly the first 50 registry entries). Round-10 rotation
# (executes the r9 verdict directive #1 name-for-name): (1) the SEVEN
# r6-vintage rows deferred from r9 (age 4 at r10 — past the <=3-round
# evidence bound, so they open the window), (2) the full 38-row
# r7-vintage cohort (age 3 at r10, the boundary — everything here
# breaches at r11 if deferred), (3) the standing canaries
# corpus_curation_pipeline + corpus_merge_state (the latter also
# re-greens the r10 streaming return-contract trim live) and the
# reference-parity core weather_pipeline_e2e, then (4) the round's TWO
# debutants, exactly the budget the r9 verdict allotted:
# ann_ivf_index_topk (persisted IVF index store; JVM-only plan) and
# corpus_training_export dead-LAST (worker-risk tail discipline — it is
# the round's only NEW applyInPandas consumer, so a Python-worker death
# costs only its own, previously-nonexistent row). 7+38+3+2 = exactly
# 50 slots.
# Banking plan: the 44-row r8 cohort is age 2 now and MUST rotate in at
# r11 (44 + canaries + e2e = 47 slots, leaving ~3 for r11 debutants);
# the 50-row r9 cohort breaches at r12 — its non-canary rows (~46) fill
# that window, so r11/r12 debutants must be capped accordingly. The two
# r10 debutants, once green, bank until r13.
_DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # The seven age-4 r6-vintage rows (r9 verdict: r10 MUST open with):
    "top_revenue_orders",
    "nation_revenue",
    "segment_order_stats",
    "user_sessions",
    "latest_event_per_user",
    "dedup_events_hourly",
    "doc_dedup_exact",
    # The 38-row r7-vintage cohort (age 3 at r10):
    "brand_part_stats",
    "customers_with_big_orders",
    "customers_without_orders",
    "nationkeys_union",
    "customer_only_nations",
    "daily_event_type_pivot",
    "nations_intersect",
    "orders_cube",
    "orders_grouping_sets",
    "customer_string_battery",
    "conditional_aggs",
    "daily_counts_unpivot",
    "kmeans_clusters",
    "doc_duplicate_groups",
    "doc_minhash_signatures",
    "doc_simhash",
    "weather_daily_summary",
    "weather_latest",
    "weather_seasonal_trends",
    "weather_quality_metrics",
    "doc_simhash_pairs",
    "events_anomaly_zscore",
    "doc_winnow_overlap_pairs",
    "doc_passage_pairs_blocked",
    "dedup_recall_probe",
    "passage_recall_probe",
    "events_mad_outliers_approx",
    "corpus_ingest_history_report",
    "corpus_mixture_plan",
    "neardup_cluster_keep",
    "events_zorder_layout",
    "corpus_curriculum_stages",
    "corpus_bpe_merges",
    "corpus_epoch_expand",
    "events_mad_outliers",
    "neardup_transitivity_stats",
    "corpus_pack_intact",
    "corpus_pack_stats",
    # Standing canaries + reference-parity core:
    "corpus_curation_pipeline",
    "corpus_merge_state",
    "weather_pipeline_e2e",
    # r10 debutants (the 2-slot budget): JVM-only index store first,
    # the applyInPandas flagship dead-LAST (worker-risk tail):
    "ann_ivf_index_topk",
    "corpus_training_export",
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
