"""Batch sources — every reader enforces an explicit schema (no inference).

Covers SURVEY §2.1: landed API JSON (S3 as from_json), cities config (S4),
CSV compatibility reader (S5), plus the parquet testdata loader used by the
driver harness. The live REST fetch (S1/S2) lives in sources/rest.py.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_weather_data_pipeline_spark.schemas import (
    API_SCHEMA,
    CITIES_SCHEMA,
    RAW_SCHEMA,
    TESTDATA_TABLES,
)

DEFAULT_CITIES = [
    {"city": "London", "country_code": "GB"},
    {"city": "New York", "country_code": "US"},
    {"city": "Tokyo", "country_code": "JP"},
    {"city": "Paris", "country_code": "FR"},
    {"city": "Sydney", "country_code": "AU"},
    {"city": "Berlin", "country_code": "DE"},
    {"city": "Moscow", "country_code": "RU"},
    {"city": "Beijing", "country_code": "CN"},
    {"city": "Mumbai", "country_code": "IN"},
    {"city": "Cairo", "country_code": "EG"},
]


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver testdata table (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_all_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: read_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql plans."""
    for name, df in read_all_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def parse_api_payload(df: DataFrame, json_col: str = "value") -> DataFrame:
    """S3 — nested API JSON → flat RAW_SCHEMA rows, declaratively.

    The reference flattens imperatively with defaulting logic
    (src/ingest.py:152-169); here it is from_json + one select, so Catalyst
    prunes unused branches of the nested struct at the scan.
    Unit conversions: visibility m→km (/1000, default 0), dt epoch→ts.

    Records whose payload fails to parse, or is missing an IDENTITY field
    (name / sys.country / dt), are dropped — reference parity: its parser
    raises KeyError on a missing required field and the record is skipped
    (src/ingest.py:113-118). Without the drop, a corrupt landed line
    becomes an all-NULL row and a dt-less payload becomes a NULL-keyed
    observation — unkeyable by the upsert (NULL never equality-matches,
    so every re-run would re-insert it). Measure fields keep the lenient
    defaults above.
    """
    parsed = df.select(F.from_json(F.col(json_col), API_SCHEMA).alias("j"))
    parsed = parsed.filter(
        F.col("j").isNotNull()
        & F.col("j.name").isNotNull()
        & F.col("j.sys.country").isNotNull()
        & F.col("j.dt").isNotNull()
    )
    return parsed.select(
        F.col("j.name").alias("city"),
        F.col("j.sys.country").alias("country"),
        F.timestamp_seconds(F.col("j.dt")).alias("timestamp"),
        F.col("j.main.temp").alias("temperature"),
        F.col("j.main.feels_like").alias("feels_like"),
        F.col("j.main.humidity").cast("int").alias("humidity"),
        F.col("j.main.pressure").cast("int").alias("pressure"),
        F.coalesce(F.col("j.weather")[0]["description"], F.lit("")).alias(
            "description"
        ),
        F.coalesce(F.col("j.wind.speed"), F.lit(0.0)).alias("wind_speed"),
        F.coalesce(F.col("j.wind.deg"), F.lit(0)).cast("int").alias(
            "wind_direction"
        ),
        F.coalesce(F.col("j.clouds.all"), F.lit(0)).cast("int").alias("cloudiness"),
        (F.coalesce(F.col("j.visibility"), F.lit(0)) / 1000.0).alias("visibility"),
        F.col("j.coord.lat").alias("lat"),
        F.col("j.coord.lon").alias("lon"),
    )


def read_api_json(spark: SparkSession, path: str) -> DataFrame:
    """Read landed API JSON files (one payload per line) → RAW rows."""
    raw = spark.read.text(path)
    return parse_api_payload(raw, "value")


def read_raw_csv(spark: SparkSession, path: str) -> DataFrame:
    """S5 — CSV compatibility reader with the RAW schema enforced (the
    reference re-infers types at every CSV hand-off,
    weather_etl_dag.py:182,251-255 — a correctness hazard we remove)."""
    return spark.read.schema(RAW_SCHEMA).csv(path, header=True)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC reader — schema travels with the files (columnar, self-
    describing), so unlike CSV no re-enforcement is needed."""
    return spark.read.orc(path)


def load_cities(spark: SparkSession, path: str | None = None) -> DataFrame:
    """S4 — cities config with hard-coded fallback
    (reference src/ingest.py:192-213)."""
    rows = DEFAULT_CITIES
    if path and os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
        rows = data.get("cities", data) if isinstance(data, dict) else data
    return spark.createDataFrame(rows, CITIES_SCHEMA)


DOC_CORPUS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars int"
)


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: str = DOC_CORPUS_SCHEMA,
    keep_corrupt: bool = False,
) -> DataFrame:
    """JSON-lines document corpus with file provenance.

    Schema is ENFORCED, never inferred — at 100 TB an inference pass is a
    full extra read, and drifting inferred types silently corrupt
    downstream fingerprints. ``source_file`` (via input_file_name) records
    which landed file each doc came from, the lineage column an audit or
    a targeted re-ingest needs.

    Malformed lines are a fact of crawl data: by default they are DROPPED
    (mode=DROPMALFORMED — ingest keeps flowing); with ``keep_corrupt``
    they land in a ``_corrupt_record`` column instead so a quarantine
    branch can count/store them (filter ``_corrupt_record IS NOT NULL``).
    """
    if keep_corrupt:
        df = spark.read.schema(
            schema + ", _corrupt_record string"
        ).option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", "_corrupt_record"
        ).json(path)
    else:
        df = spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
    return df.withColumn("source_file", F.input_file_name())


def read_text_corpus(
    spark: SparkSession, path: str, whole_files: bool = False
) -> DataFrame:
    """Raw text files as documents.

    ``whole_files=False``: one doc per line; ``doc_id`` is the xxhash64 of
    (file, text) — content-addressed, so it is stable across re-reads,
    partitionings, and engines (monotonically_increasing_id is NOT: it
    renumbers whenever the split layout changes). Identical lines in the
    same file collapse to one id, which downstream exact dedup would do
    anyway. ``whole_files=True``: one doc per file (wholetext), the file
    path is the natural id.
    """
    if whole_files:
        df = spark.read.text(path, wholetext=True)
        return df.select(
            F.input_file_name().alias("source_file"),
            F.col("value").alias("text"),
        ).withColumn("doc_id", F.xxhash64("source_file"))
    df = spark.read.text(path)
    return df.select(
        F.input_file_name().alias("source_file"),
        F.col("value").alias("text"),
    ).withColumn("doc_id", F.xxhash64("source_file", "text"))
