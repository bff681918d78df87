"""SparkSession factory tuned for this engine.

Local mode is a single JVM with N executor threads; on a real cluster the
same settings hold except memory/executor sizing. AQE is on so skewed
shuffles re-plan at runtime; the session timezone is pinned to UTC so
timestamp semantics match the DuckDB oracle (naive-UTC) exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl_weather_data_pipeline_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    - ``spark.sql.shuffle.partitions`` defaults to the core count: on
      local[N] the default 200 over-parallelizes tiny shuffles; on a real
      cluster this is overridden (or left to AQE coalescing).
    - AQE + skew-join handling on: runtime re-planning is the first line of
      defense against skewed keys at 100 TB.
    - Arrow enabled for any pandas_udf / toPandas path.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def release_local_checkpoint(df) -> None:
    """Free an eager ``localCheckpoint``'s RDD blocks NOW instead of
    waiting for GC/ContextCleaner.

    ``DataFrame.unpersist`` is a no-op for checkpointed frames: their
    analyzed plan is a ``LogicalRDD``, not a CacheManager entry
    (verified on Spark 4.1 — storage blocks survive ``unpersist(True)``
    but drop to zero after ``LogicalRDD.rdd().unpersist()``). Without an
    explicit release, repeated lifecycle queries in one long-lived
    driver session accumulate checkpoint blocks until the cleaner gets
    around to them.

    The frame must NOT be used afterwards — reading a released
    checkpoint raises CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — so call this
    only from ``finally`` blocks on frames the caller itself created.
    Best-effort: non-LogicalRDD plans are ignored and reflection
    failures are swallowed (cleanup then falls back to the
    ContextCleaner, the pre-existing behavior).
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass
