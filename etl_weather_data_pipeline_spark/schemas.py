"""Explicit schemas — never inferred.

The reference declares its schema twice (a dataclass at
``src/ingest.py:20-36`` and DDL at ``sql/schema.sql:9-39``) and lets pandas
re-infer types at every CSV hand-off. Here every lifecycle stage has exactly
one ``StructType`` and readers enforce it (schema-on-read, no inference).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Raw observation — one row per (city, fetch-time).
# Mirrors WeatherDataPoint (reference src/ingest.py:20-36), 14 fields.
# ---------------------------------------------------------------------------
RAW_SCHEMA = T.StructType(
    [
        T.StructField("city", T.StringType(), False),
        T.StructField("country", T.StringType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("temperature", T.DoubleType(), True),
        T.StructField("feels_like", T.DoubleType(), True),
        T.StructField("humidity", T.IntegerType(), True),
        T.StructField("pressure", T.IntegerType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("wind_speed", T.DoubleType(), True),
        T.StructField("wind_direction", T.IntegerType(), True),
        T.StructField("cloudiness", T.IntegerType(), True),
        T.StructField("visibility", T.DoubleType(), True),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("lon", T.DoubleType(), True),
    ]
)

RAW_COLUMNS = [f.name for f in RAW_SCHEMA.fields]

# Critical fields: rows with nulls here are dropped (reference
# src/transform.py:114-117).
CRITICAL_FIELDS = ["temperature", "humidity", "pressure", "lat", "lon"]

# ---------------------------------------------------------------------------
# Nested source JSON from the weather API (reference tests/conftest.py:125-145)
# — parsed with from_json, then flattened declaratively (SURVEY §2.1 S3).
# ---------------------------------------------------------------------------
API_SCHEMA = T.StructType(
    [
        T.StructField(
            "coord",
            T.StructType(
                [
                    T.StructField("lon", T.DoubleType()),
                    T.StructField("lat", T.DoubleType()),
                ]
            ),
        ),
        T.StructField(
            "weather",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.LongType()),
                        T.StructField("main", T.StringType()),
                        T.StructField("description", T.StringType()),
                        T.StructField("icon", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "main",
            T.StructType(
                [
                    T.StructField("temp", T.DoubleType()),
                    T.StructField("feels_like", T.DoubleType()),
                    T.StructField("temp_min", T.DoubleType()),
                    T.StructField("temp_max", T.DoubleType()),
                    T.StructField("pressure", T.LongType()),
                    T.StructField("humidity", T.LongType()),
                ]
            ),
        ),
        T.StructField("visibility", T.LongType()),
        T.StructField(
            "wind",
            T.StructType(
                [
                    T.StructField("speed", T.DoubleType()),
                    T.StructField("deg", T.LongType()),
                ]
            ),
        ),
        T.StructField("clouds", T.StructType([T.StructField("all", T.LongType())])),
        T.StructField("dt", T.LongType()),
        T.StructField(
            "sys",
            T.StructType(
                [
                    T.StructField("type", T.LongType()),
                    T.StructField("id", T.LongType()),
                    T.StructField("country", T.StringType()),
                    T.StructField("sunrise", T.LongType()),
                    T.StructField("sunset", T.LongType()),
                ]
            ),
        ),
        T.StructField("timezone", T.LongType()),
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("cod", T.LongType()),
    ]
)

# ---------------------------------------------------------------------------
# Enriched observation — RAW plus 12 derived columns (reference
# src/transform.py:153-184; 26-column contract tests/test_transform.py:38-44).
# ---------------------------------------------------------------------------
DERIVED_COLUMNS = [
    "date",
    "hour",
    "day_of_week",
    "month",
    "season",
    "temp_category",
    "humidity_category",
    "wind_category",
    "comfort_index",
    "location",
    "coord_string",
    "quality_score",
]

ENRICHED_SCHEMA = T.StructType(
    list(RAW_SCHEMA.fields)
    + [
        T.StructField("date", T.DateType(), True),
        T.StructField("hour", T.IntegerType(), True),
        T.StructField("day_of_week", T.StringType(), True),
        T.StructField("month", T.StringType(), True),
        T.StructField("season", T.StringType(), True),
        T.StructField("temp_category", T.StringType(), True),
        T.StructField("humidity_category", T.StringType(), True),
        T.StructField("wind_category", T.StringType(), True),
        T.StructField("comfort_index", T.DoubleType(), True),
        T.StructField("location", T.StringType(), True),
        T.StructField("coord_string", T.StringType(), True),
        T.StructField("quality_score", T.DoubleType(), True),
    ]
)

ENRICHED_COLUMNS = [f.name for f in ENRICHED_SCHEMA.fields]

# ---------------------------------------------------------------------------
# Operational tables (reference sql/schema.sql:42-68).
# ---------------------------------------------------------------------------
QUALITY_METRICS_SCHEMA = T.StructType(
    [
        T.StructField("total_records_input", T.LongType()),
        T.StructField("total_records_output", T.LongType()),
        T.StructField("data_retention_rate", T.DoubleType()),
        T.StructField("average_quality_score", T.DoubleType()),
        T.StructField("missing_values_percentage", T.DoubleType()),
        T.StructField("unique_cities", T.LongType()),
        T.StructField("unique_countries", T.LongType()),
        T.StructField("timestamp_min", T.TimestampType()),
        T.StructField("timestamp_max", T.TimestampType()),
        T.StructField("metrics_json", T.StringType()),
        T.StructField("load_timestamp", T.TimestampType()),
    ]
)

LOAD_HISTORY_SCHEMA = T.StructType(
    [
        T.StructField("records_loaded", T.LongType()),
        T.StructField("records_updated", T.LongType()),
        T.StructField("records_failed", T.LongType()),
        T.StructField("load_duration_seconds", T.DoubleType()),
        T.StructField("status", T.StringType()),
        T.StructField("error_message", T.StringType()),
        T.StructField("source_info", T.StringType()),
        T.StructField("load_timestamp", T.TimestampType()),
    ]
)

# Cities config (reference config/cities.json).
CITIES_SCHEMA = T.StructType(
    [
        T.StructField("city", T.StringType(), False),
        T.StructField("country_code", T.StringType(), False),
    ]
)

# Driver synthetic testdata tables (TESTDATA.md).
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
