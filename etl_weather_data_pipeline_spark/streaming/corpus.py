"""Streaming corpus ingest: the incremental half of corpus curation.

A training-data pipeline rarely re-curates from scratch — new documents
arrive continuously (crawls, uploads, partner feeds) and must be
quality-gated and deduplicated against the recent stream BEFORE they are
appended to the corpus store. This module runs the curation flagship's
first two stages (quality bucket filter, exact content dedup) as a
structured stream:

- quality gating is stateless (pure column expressions — identical code
  to the batch path, `functions/text.py`);
- exact dedup keys on the content fingerprint with
  ``dropDuplicatesWithinWatermark``, so dedup state is evicted as the
  watermark advances instead of growing with the corpus (the batch-side
  full-history dedup stays the job of `operators/dedup.py dedup_exact`
  over the stored table — the stream only guarantees no duplicates
  WITHIN the watermark horizon, which is the standard lambda split).

Near-dup (LSH) curation is NOT attempted in-stream: signature banding
needs a self-join over the whole corpus, which is a batch shape; run
`corpus_curation_pipeline` over the store periodically instead.

At 100 TB-a-day ingest the only state is the fingerprint dedup map
bounded by the watermark horizon; everything else is map-side.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_weather_data_pipeline_spark.functions import text as TX

DOC_STREAM_SCHEMA = (
    "doc_id long, text string, lang string, source string, "
    "ingest_ts timestamp"
)


def stream_docs(spark: SparkSession, landing_dir: str) -> DataFrame:
    """Streaming source: schema-enforced JSON-lines document landing dir."""
    return spark.readStream.schema(DOC_STREAM_SCHEMA).json(landing_dir)


def curate_stream(
    sdf: DataFrame,
    watermark: str = "10 minutes",
    text_col: str = "text",
    ts_col: str = "ingest_ts",
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Quality-gate + watermarked exact dedup for a document stream.

    Returns the curated stream with a ``quality_bucket`` column ('ok'
    rows only) and the internal fingerprint dropped. The dedup key is the
    normalized-content fingerprint (xxhash64 by default — the stream has
    no cross-engine oracle, so the production hash family is the right
    default here); state lifetime is bounded by ``watermark``.
    """
    text = F.col(text_col)
    bucket = TX.quality_bucket(
        TX.token_count(text),
        TX.stopword_ratio(text),
        TX.distinct_token_ratio(text),
    )
    return (
        sdf.withWatermark(ts_col, watermark)
        .withColumn("quality_bucket", bucket)
        .filter(F.col("quality_bucket") == "ok")
        .withColumn("__fp", TX.fingerprint(text, hash_family))
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )


def start_corpus_append_sink(
    curated: DataFrame,
    path: str,
    checkpoint_dir: str,
    partition_by: tuple[str, ...] = ("lang",),
):
    """Append the curated stream to the corpus store, partitioned for the
    downstream batch curation scans. Exactly-once via the streaming
    checkpoint; the periodic batch `corpus_curation_pipeline` +
    `compact_parquet` pass owns global dedup and file sizing."""
    return (
        curated.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy(*partition_by)
        .outputMode("append")
        .trigger(availableNow=True)
    )


def merge_batch_into_corpus(
    batch_df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_family: str = "xxhash64",
    partition_by: tuple[str, ...] = (),
) -> int:
    """Append only NEVER-SEEN documents to the corpus store.

    The store carries a ``fingerprint`` column, so the history probe is a
    column-pruned scan of 8/32-byte keys — the batch anti-joins that
    projection, never the documents. When the store itself is multi-TB,
    keep it as a table bucketed on the fingerprint
    (``sinks.writers.write_bucketed_table``): the probe then shuffles
    ONLY the new batch while the store reads in place (plan pinned in
    tests/test_properties.py::test_bucketed_store_probe_shuffles_batch_only). Within-batch duplicates collapse to
    the min-id row first (window over the fingerprint), so a batch can't
    race itself. Returns the number of rows appended.

    This makes the append IDEMPOTENT under at-least-once replay: a
    foreachBatch retry re-probes the store, finds its own previous
    append, and writes nothing — which upgrades the sink to effective
    exactly-once without transactional storage.
    """
    from pyspark.sql.window import Window

    spark = batch_df.sparkSession
    # NULL text is not ingestible content — drop it BEFORE fingerprinting,
    # and do it for every hash family: md5(NULL) is NULL, which can never
    # match the left-anti store probe (NULL = NULL is not true), so every
    # at-least-once replay would re-append the row and silently break the
    # idempotency guarantee above; xxhash64(NULL) is a non-NULL constant,
    # which would instead ingest one junk row. Filtering the text column
    # gives both families identical, sane semantics.
    batch = batch_df.filter(F.col(text_col).isNotNull()).withColumn(
        "fingerprint", TX.fingerprint(F.col(text_col), hash_family)
    )
    rn = F.row_number().over(
        Window.partitionBy("fingerprint").orderBy(F.col(id_col))
    )
    batch = batch.withColumn("__rn", rn).filter(F.col("__rn") == 1).drop("__rn")
    # Probe the store only when it exists. ONLY the missing-path case may
    # fall back to "everything is fresh" — any other store-read failure
    # (permissions, corrupt footer, listing error) must fail the batch so
    # the streaming query retries; swallowing it would silently disable
    # full-history dedup and append duplicates.
    try:
        seen = spark.read.parquet(path).select("fingerprint")
        fresh = batch.join(seen, "fingerprint", "left_anti")
    except AnalysisException as e:
        if "PATH_NOT_FOUND" not in str(e):
            raise
        fresh = batch  # first batch: store doesn't exist yet
    # persist: count + write are two actions; without it the fingerprint
    # projection + store anti-join runs twice per micro-batch.
    fresh = fresh.persist()
    try:
        n = fresh.count()
        if n:
            writer = fresh.write.mode("append")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(path)
    finally:
        fresh.unpersist()
    return n


def start_corpus_merge_sink(
    curated: DataFrame,
    path: str,
    checkpoint_dir: str,
    partition_by: tuple[str, ...] = (),
):
    """foreachBatch sink closing the lambda gap: `curate_stream` already
    guarantees no duplicates WITHIN the watermark horizon; this sink
    additionally probes the persistent store's fingerprint projection, so
    nothing that was EVER ingested is appended twice — full-history dedup
    with zero unbounded stream state (the history lives in the store
    itself, column-pruned to the key)."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_into_corpus(batch_df, path, partition_by=partition_by)

    return (
        curated.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
    )
