"""Integration tests for the e2e pipeline, sinks, views, and quality gate —
ports the reference integration suite (tests/test_integration.py) to the
Spark engine."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_weather_data_pipeline_spark.operators.quality import (
    QualityThresholds,
    quality_gate,
    quality_metrics,
)
from etl_weather_data_pipeline_spark.pipeline import run_pipeline
from etl_weather_data_pipeline_spark.plans import views
from etl_weather_data_pipeline_spark.schemas import RAW_SCHEMA
from etl_weather_data_pipeline_spark.sinks.writers import merge_upsert
from etl_weather_data_pipeline_spark.transform import transform_weather


def _obs(city, cc, h, temp, lat=51.5, lon=-0.1, minute=0, day=7):
    return (
        city, cc, dt.datetime(2023, 11, day, h, minute), temp, temp - 1.0,
        60, 1013, "ok", 3.0, 180, 40, 10.0, lat, lon,
    )


@pytest.fixture()
def batch(spark):
    rows = [
        _obs(c, cc, h, t + h, lat, lon)
        for c, cc, lat, lon, t in [
            ("London", "GB", 51.5, -0.12, 15.0),
            ("Tokyo", "JP", 35.6, 139.6, 22.0),
            ("Paris", "FR", 48.8, 2.35, 12.0),
        ]
        for h in range(3)
    ]
    return spark.createDataFrame(rows, RAW_SCHEMA)


def test_run_pipeline_e2e(spark, batch, tmp_path):
    wh = str(tmp_path / "wh")
    m = run_pipeline(spark, batch, wh, source_info="test")
    assert m["total_records_input"] == 9
    assert m["total_records_output"] == 9
    assert m["data_retention_rate"] == 1.0
    stored = spark.read.parquet(f"{wh}/weather_data")
    assert stored.count() == 9
    hist = spark.read.parquet(f"{wh}/load_history").collect()
    assert hist[0]["status"] == "success"
    metrics = spark.read.parquet(f"{wh}/data_quality_metrics").collect()
    assert metrics[0]["unique_cities"] == 3
    assert metrics[0]["metrics_json"].startswith("{")


def test_upsert_idempotency(spark, batch, tmp_path):
    """Reference tests/test_integration.py:150-210: re-loading the same
    keys must not grow the table; changed values must win."""
    wh = str(tmp_path / "wh")
    enriched = transform_weather(batch)
    merge_upsert(spark, enriched, f"{wh}/weather_data")
    n1 = spark.read.parquet(f"{wh}/weather_data").count()
    # same keys, bumped temperature
    bumped = transform_weather(
        batch.withColumn("temperature", F.col("temperature") + 1.0)
    )
    counts = merge_upsert(spark, bumped, f"{wh}/weather_data")
    stored = spark.read.parquet(f"{wh}/weather_data")
    assert stored.count() == n1
    assert counts["updated"] == n1 and counts["inserted"] == 0
    london = stored.filter(
        (F.col("city") == "London") & (F.col("hour") == 0)
    ).first()
    assert london["temperature"] == 16.0  # updated row won


def test_quality_gate_failure_on_dirty_batch(spark, tmp_path):
    rows = [_obs("A", "AA", 0, 15.0), _obs("B", "BB", 0, 999.0)]
    df = spark.createDataFrame(rows, RAW_SCHEMA)
    with pytest.raises(ValueError, match="quality gate failed"):
        run_pipeline(spark, df, str(tmp_path / "wh"))
    hist = spark.read.parquet(f"{tmp_path}/wh/load_history").collect()
    assert hist[0]["status"] == "quality_gate_failed"


def test_quality_gate_thresholds(spark, batch):
    enriched = transform_weather(batch)
    m = quality_metrics(enriched, 9)
    quality_gate(m)  # passes with defaults
    with pytest.raises(ValueError, match="records"):
        quality_gate(m, QualityThresholds(min_records=100))
    with pytest.raises(ValueError, match="retention"):
        quality_gate(quality_metrics(enriched, 100), QualityThresholds())


def test_views_over_stored_table(spark, batch, tmp_path):
    wh = str(tmp_path / "wh")
    run_pipeline(spark, batch, wh)
    stored = spark.read.parquet(f"{wh}/weather_data")
    views.register_weather_views(stored)
    daily = spark.sql(
        "SELECT * FROM daily_weather_summary ORDER BY city"
    ).collect()
    assert len(daily) == 3
    assert all(r["record_count"] == 3 for r in daily)
    latest = spark.sql("SELECT city, hour FROM latest_weather ORDER BY city").collect()
    assert [r["hour"] for r in latest] == [2, 2, 2]  # newest hour per city
    seasonal = spark.sql("SELECT * FROM seasonal_weather_trends").collect()
    assert all(r["season"] == "Autumn" for r in seasonal)
    summary = views.data_summary(stored).first()
    assert summary["total_records"] == 9
    assert summary["unique_countries"] == 3


def test_partition_pruning_on_date(spark, batch, tmp_path):
    """The date partitioning replaces the reference's indexes; a date
    filter must prune partitions at scan time."""
    wh = str(tmp_path / "wh")
    two_days = batch.union(
        spark.createDataFrame(
            [_obs("London", "GB", 1, 10.0, day=8)], RAW_SCHEMA
        )
    )
    run_pipeline(spark, two_days, wh)
    stored = spark.read.parquet(f"{wh}/weather_data")
    plan = (
        stored.filter(F.col("date") == "2023-11-08")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan
    assert stored.filter(F.col("date") == "2023-11-08").count() == 1
