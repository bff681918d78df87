"""The reference's four analytic views (sql/schema.sql:79-140) as DataFrame
functions, plus the in-code DB summary (A2, src/load.py:556-588).

Each is a one-shuffle plan (hash aggregate or one window) over the enriched
weather table; with the table partitioned by ``date``, date-ranged queries
prune partitions before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_weather_data_pipeline_spark.operators.windows import latest_per_group


def daily_weather_summary(df: DataFrame) -> DataFrame:
    """A3 — sql/schema.sql:82-97."""
    return (
        df.groupBy("city", "country", "date")
        .agg(
            F.round(F.avg("temperature"), 2).alias("avg_temperature"),
            F.min("temperature").alias("min_temperature"),
            F.max("temperature").alias("max_temperature"),
            F.round(F.avg("humidity"), 2).alias("avg_humidity"),
            F.round(F.avg("pressure"), 2).alias("avg_pressure"),
            F.round(F.avg("wind_speed"), 2).alias("avg_wind_speed"),
            F.round(F.avg("quality_score"), 2).alias("avg_quality_score"),
            F.count("*").alias("record_count"),
        )
        .orderBy(F.col("date").desc(), F.col("city"))
    )


def latest_weather(df: DataFrame) -> DataFrame:
    """W1 — sql/schema.sql:100-115 (DISTINCT ON → row_number)."""
    return latest_per_group(df, ["city", "country"], "timestamp")


def data_quality_summary(metrics_df: DataFrame) -> DataFrame:
    """A4 — sql/schema.sql:118-127, over the quality-metrics table."""
    return (
        metrics_df.groupBy(F.to_date("load_timestamp").alias("load_date"))
        .agg(
            F.round(F.avg("data_retention_rate"), 4).alias("avg_retention_rate"),
            F.round(F.avg("average_quality_score"), 2).alias("avg_quality_score"),
            F.sum("total_records_output").alias("total_records"),
            F.count("*").alias("load_count"),
        )
        .orderBy(F.col("load_date").desc())
    )


def seasonal_weather_trends(df: DataFrame) -> DataFrame:
    """A5 — sql/schema.sql:130-140."""
    return (
        df.groupBy("season", "temp_category")
        .agg(
            F.count("*").alias("observation_count"),
            F.round(F.avg("temperature"), 2).alias("avg_temperature"),
            F.round(F.avg("humidity"), 2).alias("avg_humidity"),
            F.round(F.avg("wind_speed"), 2).alias("avg_wind_speed"),
        )
        .orderBy("season", "temp_category")
    )


def data_summary(df: DataFrame) -> DataFrame:
    """A2 — src/load.py:556-588: global stats over the stored table."""
    return df.agg(
        F.count("*").alias("total_records"),
        F.countDistinct("city").alias("unique_cities"),
        F.countDistinct("country").alias("unique_countries"),
        F.min("timestamp").alias("earliest"),
        F.max("timestamp").alias("latest"),
        F.round(F.avg("temperature"), 2).alias("avg_temperature"),
        F.round(F.avg("humidity"), 2).alias("avg_humidity"),
        F.round(F.avg("quality_score"), 2).alias("avg_quality_score"),
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
