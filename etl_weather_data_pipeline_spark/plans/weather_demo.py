"""Flagship query: the reference's FULL transform pipeline vs a SQL oracle.

A deterministic weather-observation table is derived from ``events`` (dirty
strings, nulls, out-of-range values — every cleaning path gets exercised),
then run through ``transform_weather`` — the complete reference surface
(clean E1-E3, hourly dedup D1, null handling P2/N1/N2 incl. median
imputation, normalize E4-E7, enrich E8-E19, validate P3-P6) — and compared
26-columns-wide against a hand-mirrored DuckDB CTE chain.

Float derivations use power-of-2 divisions (value/8, /4, /16) so every
intermediate double is an exact binary scaling of the source column;
combined with decimal-routed rounding (functions/weather.py round_to) the
whole pipeline is bit-deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_weather_data_pipeline_spark.plans.catalog import Query, load
from etl_weather_data_pipeline_spark.transform import transform_weather

QUERIES: list[Query] = []

# Oracle mirror of the derived raw observation table (dirty inputs).
_O_RAW = """
  SELECT
    '  city ' || CAST(user_id % 20 AS VARCHAR) || ' ' AS city,
    ' c' || CAST(user_id % 5 AS VARCHAR) || ' ' AS country,
    ts AS timestamp,
    CASE WHEN event_type = 'error' THEN value/8 - 80 ELSE value/8 - 20 END
        AS temperature,
    value/8 - 21 AS feels_like,
    CAST(NULLIF((event_id % 130) - 5, 7) AS INT) AS humidity,
    CAST(800 + event_id % 350 AS INT) AS pressure,
    ' ' || upper(event_type) || ' ' AS description,
    CASE WHEN event_id % 11 = 0 THEN NULL ELSE value/4 END AS wind_speed,
    CAST((event_id % 500) - 70 AS INT) AS wind_direction,
    CAST(event_id % 120 AS INT) AS cloudiness,
    CASE WHEN event_id % 13 = 0 THEN NULL ELSE value/16 END AS visibility,
    (event_id % 200) - 100 + 0.5 AS lat,
    (event_id % 400) - 200 + 0.25 AS lon
  FROM events
"""

_O_DROUND = "CAST(ROUND(CAST({x} AS DECIMAL(28,10)), {n}) AS DOUBLE)"


def _oracle() -> str:
    r1 = _O_DROUND.format(x="temperature", n=1)
    return f"""
WITH raw AS ({_O_RAW}),
-- E1-E3: text cleaning (inputs are known-shape, so cleaned forms inline)
cleaned AS (
  SELECT raw.* REPLACE (
    'City ' || trim(substr(trim(city), 5)) AS city,
    upper(trim(country)) AS country,
    lower(trim(description)) AS description)
  FROM raw
),
-- D1: earliest observation per (city, country, hour)
dedup AS (
  SELECT * FROM (
    SELECT c.*, row_number() OVER (
        PARTITION BY city, country, date_trunc('hour', timestamp)
        ORDER BY timestamp, temperature, pressure) AS rn
    FROM cleaned c)
  WHERE rn = 1
),
-- P2: drop critical nulls; N1: constant fill
filled AS (
  SELECT city, country, timestamp, temperature, feels_like, humidity,
         pressure, description,
         COALESCE(wind_speed, 0.0) AS wind_speed,
         COALESCE(wind_direction, 0) AS wind_direction,
         cloudiness, visibility, lat, lon
  FROM dedup
  WHERE temperature IS NOT NULL AND humidity IS NOT NULL
    AND pressure IS NOT NULL AND lat IS NOT NULL AND lon IS NOT NULL
),
-- N2: median imputation for visibility (two-pass agg -> fill)
med AS (SELECT median(visibility) AS m FROM filled),
imputed AS (
  SELECT f.* REPLACE (COALESCE(f.visibility, med.m) AS visibility)
  FROM filled f, med
),
-- E4-E7: clip / wrap / decimal-round
normalized AS (
  SELECT city, country, timestamp,
         {_O_DROUND.format(x='temperature', n=1)} AS temperature,
         {_O_DROUND.format(x='feels_like', n=1)} AS feels_like,
         least(greatest(humidity, 0), 100) AS humidity,
         pressure, description,
         {_O_DROUND.format(x='wind_speed', n=1)} AS wind_speed,
         ((wind_direction % 360) + 360) % 360 AS wind_direction,
         least(greatest(cloudiness, 0), 100) AS cloudiness,
         {_O_DROUND.format(x='greatest(visibility, 0.0)', n=1)} AS visibility,
         {_O_DROUND.format(x='lat', n=6)} AS lat,
         {_O_DROUND.format(x='lon', n=6)} AS lon
  FROM imputed
),
-- E8-E19: enrichment to the 26-column contract
enriched AS (
  SELECT n.*,
         CAST(timestamp AS DATE) AS date,
         CAST(hour(timestamp) AS INT) AS hour,
         dayname(timestamp) AS day_of_week,
         monthname(timestamp) AS month,
         CASE WHEN month(timestamp) IN (12,1,2) THEN 'Winter'
              WHEN month(timestamp) IN (3,4,5) THEN 'Spring'
              WHEN month(timestamp) IN (6,7,8) THEN 'Summer'
              ELSE 'Autumn' END AS season,
         CASE WHEN temperature < 0 THEN 'Freezing'
              WHEN temperature < 10 THEN 'Cold'
              WHEN temperature < 20 THEN 'Cool'
              WHEN temperature < 25 THEN 'Mild'
              WHEN temperature < 30 THEN 'Warm'
              ELSE 'Hot' END AS temp_category,
         CASE WHEN humidity < 30 THEN 'Low'
              WHEN humidity < 60 THEN 'Moderate'
              ELSE 'High' END AS humidity_category,
         CASE WHEN wind_speed < 1 THEN 'Calm'
              WHEN wind_speed < 6 THEN 'Light'
              WHEN wind_speed < 12 THEN 'Gentle'
              WHEN wind_speed < 20 THEN 'Moderate'
              WHEN wind_speed < 29 THEN 'Fresh'
              WHEN wind_speed < 39 THEN 'Strong'
              ELSE 'Gale' END AS wind_category,
         {_O_DROUND.format(
             x="CASE WHEN humidity > 70 THEN temperature + (humidity - 70) * 0.1 "
               "WHEN humidity < 30 THEN temperature - (30 - humidity) * 0.05 "
               "ELSE temperature END",
             n=1,
         )} AS comfort_index,
         city || ', ' || country AS location,
         CAST(lat AS VARCHAR) || ',' || CAST(lon AS VARCHAR) AS coord_string,
         CAST(least(greatest(
             100 - (CASE WHEN visibility = 0 THEN 3 ELSE 0 END)
                 - (CASE WHEN temperature > 45 THEN 5 ELSE 0 END)
                 - (CASE WHEN temperature < -30 THEN 5 ELSE 0 END)
                 - (CASE WHEN wind_speed > 100 THEN 10 ELSE 0 END),
             0), 100) AS DOUBLE) AS quality_score
  FROM normalized n
)
-- P3-P6: physical-range validation
SELECT * FROM enriched
WHERE temperature BETWEEN -60 AND 60
  AND pressure BETWEEN 800 AND 1100
  AND wind_speed <= 200
  AND lat BETWEEN -90 AND 90
  AND lon BETWEEN -180 AND 180
"""


def q(name, description, oracle=None, tags=()):
    def deco(fn):
        QUERIES.append(Query(name, description, fn, oracle, tuple(tags)))
        return fn

    return deco


@q(
    "weather_pipeline_e2e",
    "FLAGSHIP: full reference transform pipeline (clean, hourly dedup, "
    "null handling incl. median imputation, normalize, 26-col enrich, "
    "validate) on a weather table derived from events — every derived "
    "column oracle-checked.",
    oracle=_oracle(),
)
def weather_pipeline_e2e(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    h = F.col("event_id") % 130 - 5
    raw = ev.select(
        F.concat(
            F.lit("  city "), (F.col("user_id") % 20).cast("string"), F.lit(" ")
        ).alias("city"),
        F.concat(
            F.lit(" c"), (F.col("user_id") % 5).cast("string"), F.lit(" ")
        ).alias("country"),
        F.col("ts").alias("timestamp"),
        F.when(
            F.col("event_type") == "error", F.col("value") / 8 - 80
        )
        .otherwise(F.col("value") / 8 - 20)
        .alias("temperature"),
        (F.col("value") / 8 - 21).alias("feels_like"),
        F.when(h != 7, h).cast("int").alias("humidity"),
        (F.lit(800) + F.col("event_id") % 350).cast("int").alias("pressure"),
        F.concat(F.lit(" "), F.upper("event_type"), F.lit(" ")).alias(
            "description"
        ),
        F.when(F.col("event_id") % 11 != 0, F.col("value") / 4).alias(
            "wind_speed"
        ),
        (F.col("event_id") % 500 - 70).cast("int").alias("wind_direction"),
        (F.col("event_id") % 120).cast("int").alias("cloudiness"),
        F.when(F.col("event_id") % 13 != 0, F.col("value") / 16).alias(
            "visibility"
        ),
        (F.col("event_id") % 200 - 100 + 0.5).alias("lat"),
        (F.col("event_id") % 400 - 200 + 0.25).alias("lon"),
    )
    return transform_weather(raw)


def _o_avg2(c: str) -> str:
    return _O_DROUND.format(
        x=f"CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)", n=2
    )


@q(
    "weather_daily_summary",
    "View layer A3 (daily_weather_summary, sql/schema.sql:82-97) over the "
    "flagship pipeline output — deterministic decimal-backed averages.",
    oracle=f"""
    WITH enriched AS ({_oracle()})
    SELECT city, country, date,
           {_o_avg2('temperature')} AS avg_temperature,
           MIN(temperature) AS min_temperature,
           MAX(temperature) AS max_temperature,
           {_o_avg2('humidity')} AS avg_humidity,
           {_o_avg2('pressure')} AS avg_pressure,
           {_o_avg2('wind_speed')} AS avg_wind_speed,
           {_o_avg2('quality_score')} AS avg_quality_score,
           COUNT(*) AS record_count
    FROM enriched GROUP BY city, country, date
    """,
)
def weather_daily_summary(spark, sf_dir):
    from etl_weather_data_pipeline_spark.plans.views import daily_weather_summary

    return daily_weather_summary(weather_pipeline_e2e(spark, sf_dir))


@q(
    "weather_latest",
    "View layer W1 (latest_weather, sql/schema.sql:100-115): newest "
    "observation per (city, country) via row_number over the flagship "
    "output.",
    oracle=f"""
    WITH enriched AS ({_oracle()})
    SELECT * EXCLUDE (rn) FROM (
      SELECT e.*, row_number() OVER (PARTITION BY city, country
                 ORDER BY timestamp DESC, temperature, pressure) AS rn
      FROM enriched e)
    WHERE rn = 1
    """,
)
def weather_latest(spark, sf_dir):
    from etl_weather_data_pipeline_spark.plans.views import latest_weather

    return latest_weather(weather_pipeline_e2e(spark, sf_dir))


@q(
    "weather_seasonal_trends",
    "View layer A5 (seasonal_weather_trends, sql/schema.sql:130-140) over "
    "the flagship output.",
    oracle=f"""
    WITH enriched AS ({_oracle()})
    SELECT season, temp_category,
           COUNT(*) AS observation_count,
           {_o_avg2('temperature')} AS avg_temperature,
           {_o_avg2('humidity')} AS avg_humidity,
           {_o_avg2('wind_speed')} AS avg_wind_speed
    FROM enriched GROUP BY season, temp_category
    """,
)
def weather_seasonal_trends(spark, sf_dir):
    from etl_weather_data_pipeline_spark.plans.views import seasonal_weather_trends

    return seasonal_weather_trends(weather_pipeline_e2e(spark, sf_dir))


@q(
    "weather_quality_metrics",
    "A1 (quality-metrics global aggregate, src/transform.py:301-315) over "
    "the flagship output: one-pass counts, exact distincts, deterministic "
    "avg quality, timestamp range.",
    oracle=f"""
    WITH enriched AS ({_oracle()})
    SELECT COUNT(*) AS total_records_output,
           {_O_DROUND.format(
               x="CAST(SUM(CAST(quality_score AS DECIMAL(18,2))) AS DOUBLE)"
                 " / COUNT(*)", n=2)} AS average_quality_score,
           COUNT(DISTINCT city) AS unique_cities,
           COUNT(DISTINCT country) AS unique_countries,
           MIN(timestamp) AS timestamp_min,
           MAX(timestamp) AS timestamp_max
    FROM enriched
    """,
)
def weather_quality_metrics(spark, sf_dir):
    from etl_weather_data_pipeline_spark.plans.catalog import davg, dround

    enriched = weather_pipeline_e2e(spark, sf_dir)
    return enriched.agg(
        F.count(F.lit(1)).alias("total_records_output"),
        dround(davg("quality_score"), 2).alias("average_quality_score"),
        F.countDistinct("city").alias("unique_cities"),
        F.countDistinct("country").alias("unique_countries"),
        F.min("timestamp").alias("timestamp_min"),
        F.max("timestamp").alias("timestamp_max"),
    )
