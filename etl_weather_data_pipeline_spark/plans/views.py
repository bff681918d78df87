"""The reference's four analytic views (sql/schema.sql:79-140) as DataFrame
functions, plus the in-code DB summary (A2, src/load.py:556-588).

Each is a one-shuffle plan (hash aggregate or one window) over the enriched
weather table; with the table partitioned by ``date``, date-ranged queries
prune partitions before the shuffle.

Averages are computed as exact-decimal sums divided by counts and rounded
through DECIMAL (plans/catalog.py helpers) so view results are
bit-deterministic — independent of partitioning, engine, and summation
order. At 100 TB that also means a view materialization is reproducible
run-to-run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_weather_data_pipeline_spark.operators.windows import latest_per_group
from etl_weather_data_pipeline_spark.plans.catalog import davg, dround


def _avg2(col: str):
    return dround(davg(col), 2)


def daily_weather_summary(df: DataFrame) -> DataFrame:
    """A3 — sql/schema.sql:82-97."""
    return (
        df.groupBy("city", "country", "date")
        .agg(
            _avg2("temperature").alias("avg_temperature"),
            F.min("temperature").alias("min_temperature"),
            F.max("temperature").alias("max_temperature"),
            _avg2("humidity").alias("avg_humidity"),
            _avg2("pressure").alias("avg_pressure"),
            _avg2("wind_speed").alias("avg_wind_speed"),
            _avg2("quality_score").alias("avg_quality_score"),
            F.count(F.lit(1)).alias("record_count"),
        )
        .orderBy(F.col("date").desc(), F.col("city"))
    )


def latest_weather(df: DataFrame) -> DataFrame:
    """W1 — sql/schema.sql:100-115 (DISTINCT ON → row_number), tiebroken
    deterministically on the measure tuple."""
    return latest_per_group(
        df,
        ["city", "country"],
        "timestamp",
        tiebreak=[F.col("temperature"), F.col("pressure")],
    )


def data_quality_summary(metrics_df: DataFrame) -> DataFrame:
    """A4 — sql/schema.sql:118-127, over the quality-metrics table."""
    return (
        metrics_df.groupBy(F.to_date("load_timestamp").alias("load_date"))
        .agg(
            dround(F.avg("data_retention_rate"), 4).alias("avg_retention_rate"),
            dround(F.avg("average_quality_score"), 2).alias("avg_quality_score"),
            F.sum("total_records_output").alias("total_records"),
            F.count(F.lit(1)).alias("load_count"),
        )
        .orderBy(F.col("load_date").desc())
    )


def seasonal_weather_trends(df: DataFrame) -> DataFrame:
    """A5 — sql/schema.sql:130-140."""
    return (
        df.groupBy("season", "temp_category")
        .agg(
            F.count(F.lit(1)).alias("observation_count"),
            _avg2("temperature").alias("avg_temperature"),
            _avg2("humidity").alias("avg_humidity"),
            _avg2("wind_speed").alias("avg_wind_speed"),
        )
        .orderBy("season", "temp_category")
    )


def data_summary(df: DataFrame) -> DataFrame:
    """A2 — src/load.py:556-588: global stats over the stored table."""
    return df.agg(
        F.count(F.lit(1)).alias("total_records"),
        F.countDistinct("city").alias("unique_cities"),
        F.countDistinct("country").alias("unique_countries"),
        F.min("timestamp").alias("earliest"),
        F.max("timestamp").alias("latest"),
        _avg2("temperature").alias("avg_temperature"),
        _avg2("humidity").alias("avg_humidity"),
        _avg2("quality_score").alias("avg_quality_score"),
    )


def register_weather_views(df: DataFrame, metrics_df: DataFrame | None = None) -> None:
    """Register the view layer for spark.sql access."""
    spark = df.sparkSession
    df.createOrReplaceTempView("weather_data")
    daily_weather_summary(df).createOrReplaceTempView("daily_weather_summary")
    latest_weather(df).createOrReplaceTempView("latest_weather")
    seasonal_weather_trends(df).createOrReplaceTempView("seasonal_weather_trends")
    if metrics_df is not None:
        metrics_df.createOrReplaceTempView("data_quality_metrics")
        data_quality_summary(metrics_df).createOrReplaceTempView(
            "data_quality_summary"
        )
