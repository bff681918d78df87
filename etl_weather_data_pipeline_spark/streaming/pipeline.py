"""Structured Streaming version of the weather pipeline (SURVEY §7.2 M7).

The reference's daily Airflow batch (weather_etl_dag.py:57) becomes a
continuous pipeline over a landing directory: files land (from the
driver-side REST fetch or any collector), the stream cleans/enriches
incrementally, the hour-dedup D1 becomes watermark + dropDuplicates, and
``foreachBatch`` merges each micro-batch into the keyed warehouse with the
same set-based upsert the batch path uses — exactly-once per batch.

Late data: the 1-hour watermark mirrors D1's hour-truncation semantics —
an observation arriving more than an hour late would have lost the dedup
race anyway, so dropping its state is semantically free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from etl_weather_data_pipeline_spark.schemas import RAW_SCHEMA
from etl_weather_data_pipeline_spark.transform import (
    clean_text,
    enrich,
    normalize,
    validate,
)


def stream_raw(spark: SparkSession, landing_dir: str) -> DataFrame:
    """Streaming source: schema-enforced JSON-lines landing directory."""
    return spark.readStream.schema(RAW_SCHEMA).json(landing_dir)


def streaming_dedup_hourly(sdf: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """D1 as a streaming operator: watermark + dropDuplicatesWithinWatermark
    on the hour-truncated key.

    Plain ``dropDuplicates`` would NOT evict state here: its keys (city,
    country, __h) exclude the watermarked ``timestamp`` column, and the
    derived ``__h`` carries no event-time watermark metadata — so dedup
    state grows without bound on a long-running stream.
    ``dropDuplicatesWithinWatermark`` ties every key's state lifetime to
    the stream's watermark regardless of key columns: a key is dropped once
    the watermark passes its first-seen event time, which matches D1's
    semantics (an observation arriving >1h late lost the dedup race anyway).
    """
    return (
        sdf.withWatermark("timestamp", watermark)
        .withColumn("__h", F.date_trunc("hour", F.col("timestamp")))
        .dropDuplicatesWithinWatermark(["city", "country", "__h"])
        .drop("__h")
    )


def transform_stream(sdf: DataFrame) -> DataFrame:
    """Streaming transform: clean → dedup(watermark) → fill → normalize →
    enrich → validate.

    Median imputation (N2) is inherently batch (global aggregate); the
    streaming path constant-fills visibility with 0 instead and leaves
    median backfill to a periodic batch compaction — the ONLY documented
    divergence. P2's critical-null drop applies here exactly as in the
    batch path (it is a stateless filter): without it a null-humidity
    record the batch path always rejects would land in the warehouse
    with null buckets and comfort index.
    """
    from etl_weather_data_pipeline_spark.schemas import CRITICAL_FIELDS

    out = clean_text(sdf)
    out = streaming_dedup_hourly(out)
    out = out.na.fill({"wind_speed": 0.0, "wind_direction": 0, "visibility": 0.0})
    out = out.na.drop(subset=CRITICAL_FIELDS)
    out = normalize(out)
    out = enrich(out)
    return validate(out)


def windowed_city_aggs(
    sdf: DataFrame, window: str = "1 hour", slide: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """A3 as a streaming windowed aggregate: tumbling (or sliding) window
    per city with late-data handling via watermark."""
    win = (
        F.window("timestamp", window)
        if slide is None
        else F.window("timestamp", window, slide)
    )
    return (
        sdf.withWatermark("timestamp", watermark)
        .groupBy(win.alias("win"), F.col("city"), F.col("country"))
        .agg(
            F.avg("temperature").alias("avg_temperature"),
            F.min("temperature").alias("min_temperature"),
            F.max("temperature").alias("max_temperature"),
            F.count(F.lit(1)).alias("record_count"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "city",
            "country",
            "avg_temperature",
            "min_temperature",
            "max_temperature",
            "record_count",
        )
    )


def enrich_stream_with_dim(
    sdf: DataFrame, dim: DataFrame, on: list[str], how: str = "left"
) -> DataFrame:
    """Stream-static join: enrich a stream with a bounded dimension table
    (city metadata, config). The static side is re-evaluated per
    micro-batch — dim updates between batches are picked up — and the
    broadcast hint keeps the join map-side: no shuffle of the stream, no
    join state at all (unlike stream-stream joins, stream-static joins are
    stateless)."""
    return sdf.join(F.broadcast(dim), on=on, how=how)


def join_streams_within(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "timestamp",
    right_ts: str = "timestamp",
    within: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join, watermark-bounded: pair rows sharing ``key``
    whose right-side event time falls in [left_ts, left_ts + within].
    ``how='left_outer'`` emits the null-padded left row once the watermark
    proves no match can still arrive (outer results are inherently
    delayed by the watermark — that is the correctness price of not
    holding state forever).

    Both watermarks AND the time-range predicate are load-bearing for
    state cleanup: the range tells Spark how long a buffered left row can
    still find matches, the watermarks bound how late either side may
    arrive — together the join state is capped at watermark + within of
    history per side instead of growing forever. Columns keep their side's
    name via the l/r prefixes the caller selects from."""
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}")
        )
    )
    return l.join(r, cond, how)


def sessionized_city_aggs(
    sdf: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming SESSION windows: per-city sessions close after ``gap`` of
    event-time silence. Unlike tumbling windows the window bounds are
    data-driven; state for a session is dropped once the watermark passes
    its close. (The batch analogue is the oracled session_window_stats.)"""
    return (
        sdf.withWatermark("timestamp", watermark)
        .groupBy(
            F.session_window("timestamp", gap).alias("win"),
            F.col("city"),
            F.col("country"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.avg("temperature").alias("avg_temperature"),
        )
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "city",
            "country",
            "n_obs",
            "avg_temperature",
        )
    )


def start_merge_sink(
    sdf: DataFrame,
    warehouse_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """foreachBatch sink: merge each micro-batch into the keyed warehouse
    using the same set-based upsert as the batch path (idempotent per
    batch → effectively exactly-once on replay).

    NULL-keyed rows are dropped BEFORE the merge: merge_upsert rejects
    them loudly (batch contract — a NULL key never equality-matches, so
    the row would re-insert forever), and in a checkpointed stream that
    rejection becomes a poison pill — the failed micro-batch replays
    identically on every restart and the stream never advances. Dropping
    mirrors the batch source adapter's identity-field drop
    (parse_api_payload); a landed record without its key is unloadable
    by any path."""
    from etl_weather_data_pipeline_spark.sinks.writers import (
        UPSERT_KEYS,
        merge_upsert,
    )

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df = batch_df.na.drop(subset=list(UPSERT_KEYS))
        if batch_df.isEmpty():
            return
        merge_upsert(batch_df.sparkSession, batch_df, f"{warehouse_dir}/weather_data")

    writer = sdf.writeStream.outputMode("append").foreachBatch(merge_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
