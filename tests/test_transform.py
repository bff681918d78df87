"""Unit tests for the weather transform pipeline — ports the reference's
boundary-value suite (reference tests/test_transform.py) to DataFrame
assertions."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_weather_data_pipeline_spark.functions import weather as WX
from etl_weather_data_pipeline_spark.schemas import ENRICHED_COLUMNS, RAW_SCHEMA
from etl_weather_data_pipeline_spark.transform import (
    dedup_hourly,
    handle_missing,
    transform_weather,
    validate,
)


def test_enriched_column_contract(clean_raw):
    out = transform_weather(clean_raw)
    assert out.columns == ENRICHED_COLUMNS
    assert out.count() == 3


def test_golden_sample_values(clean_raw):
    """FIXTURES.md §3 golden expectations for the three clean rows."""
    rows = {r["city"]: r for r in transform_weather(clean_raw).collect()}
    london = rows["London"]
    assert london["season"] == "Autumn"
    assert london["day_of_week"] == "Tuesday"
    assert london["month"] == "November"
    assert london["temp_category"] == "Cool"
    assert london["humidity_category"] == "High"
    assert london["wind_category"] == "Light"
    # h=65 is not >70 → comfort == temperature
    assert london["comfort_index"] == london["temperature"] == 15.5
    assert london["quality_score"] == 100.0
    assert london["location"] == "London, GB"
    assert london["coord_string"] == "51.5074,-0.1278"
    assert rows["Tokyo"]["temp_category"] == "Mild"
    assert rows["Tokyo"]["humidity_category"] == "Moderate"
    assert rows["New York"]["temp_category"] == "Cool"
    assert rows["New York"]["humidity_category"] == "High"


def test_invalid_row_filtered(dirty_raw):
    out = transform_weather(dirty_raw)
    cities = [r["city"] for r in out.select("city").collect()]
    assert "" not in cities  # invalid row gone (temp=999 etc.)
    assert "Oslo" not in cities  # critical null (temperature) dropped


def test_dedup_keeps_earliest(dirty_raw):
    out = transform_weather(dirty_raw)
    london = [r for r in out.collect() if r["city"] == "London"]
    assert len(london) == 1
    assert london[0]["timestamp"].minute == 0  # earliest in the hour won


def test_imputation(dirty_raw):
    out = handle_missing(dedup_hourly(dirty_raw))
    lima = [r for r in out.collect() if r["city"] == "Lima"][0]
    assert lima["wind_speed"] == 0.0  # N1 constant fill
    assert lima["wind_direction"] == 0
    assert lima["visibility"] is not None  # N2 median fill


@pytest.mark.parametrize(
    "month,expected",
    [(12, "Winter"), (1, "Winter"), (2, "Winter"), (3, "Spring"), (5, "Spring"),
     (6, "Summer"), (8, "Summer"), (9, "Autumn"), (11, "Autumn")],
)
def test_season_boundaries(spark, month, expected):
    df = spark.range(1).select(
        F.make_timestamp(F.lit(2023), F.lit(month), F.lit(15), F.lit(0), F.lit(0), F.lit(0)).alias("ts")
    )
    assert df.select(WX.season(F.col("ts")).alias("s")).first()["s"] == expected


@pytest.mark.parametrize(
    "t,expected",
    [(-5.0, "Freezing"), (0.0, "Cold"), (9.9, "Cold"), (10.0, "Cool"),
     (19.9, "Cool"), (20.0, "Mild"), (24.9, "Mild"), (25.0, "Warm"),
     (29.9, "Warm"), (30.0, "Hot"), (45.0, "Hot")],
)
def test_temp_category_boundaries(spark, t, expected):
    df = spark.createDataFrame([(t,)], "t double")
    assert df.select(WX.temp_category(F.col("t")).alias("c")).first()["c"] == expected


@pytest.mark.parametrize(
    "ws,expected",
    [(0.5, "Calm"), (1.0, "Light"), (5.9, "Light"), (6.0, "Gentle"),
     (11.9, "Gentle"), (12.0, "Moderate"), (19.9, "Moderate"), (20.0, "Fresh"),
     (28.9, "Fresh"), (29.0, "Strong"), (38.9, "Strong"), (39.0, "Gale")],
)
def test_wind_category_boundaries(spark, ws, expected):
    df = spark.createDataFrame([(ws,)], "ws double")
    assert df.select(WX.wind_category(F.col("ws")).alias("c")).first()["c"] == expected


@pytest.mark.parametrize(
    "t,h,expected",
    [(20.0, 80.0, 21.0),   # humid: 20 + 10*0.1
     (20.0, 20.0, 19.5),   # dry: 20 - 10*0.05
     (20.0, 50.0, 20.0),   # neutral
     (20.0, 70.0, 20.0)],  # boundary: 70 is NOT > 70
)
def test_comfort_index(spark, t, h, expected):
    df = spark.createDataFrame([(t, h)], "t double, h double")
    got = df.select(WX.comfort_index(F.col("t"), F.col("h")).alias("c")).first()["c"]
    assert got == expected


@pytest.mark.parametrize(
    "t,ws,vis,expected",
    [(20.0, 5.0, 10.0, 100.0),
     (20.0, None, 10.0, 95.0),   # null wind -5
     (20.0, 5.0, 0.0, 97.0),     # zero visibility -3
     (50.0, 5.0, 10.0, 95.0),    # extreme heat -5
     (-40.0, 5.0, 10.0, 95.0),   # extreme cold -5
     (20.0, 150.0, 10.0, 90.0)], # extreme wind -10
)
def test_quality_score(spark, t, ws, vis, expected):
    df = spark.createDataFrame([(t, ws, vis)], "t double, ws double, vis double")
    got = df.select(
        WX.quality_score(F.col("t"), F.col("ws"), F.col("vis")).alias("q")
    ).first()["q"]
    assert got == expected


def test_pmod_wraps_negative(spark):
    df = spark.createDataFrame([(-90,), (450,), (360,)], "wd int")
    got = [r[0] for r in df.select(WX.wrap_degrees(F.col("wd"))).collect()]
    assert got == [270, 90, 0]


def test_validation_range_filters(spark):
    rows = [
        ("A", "AA", dt.datetime(2023, 1, 1), -70.0, 0.0, 50, 1000, "x", 1.0, 0, 0, 1.0, 0.0, 0.0),
        ("B", "BB", dt.datetime(2023, 1, 1), 70.0, 0.0, 50, 1000, "x", 1.0, 0, 0, 1.0, 0.0, 0.0),
        ("C", "CC", dt.datetime(2023, 1, 1), 20.0, 0.0, 50, 700, "x", 1.0, 0, 0, 1.0, 0.0, 0.0),
        ("D", "DD", dt.datetime(2023, 1, 1), 20.0, 0.0, 50, 1200, "x", 1.0, 0, 0, 1.0, 0.0, 0.0),
        ("E", "EE", dt.datetime(2023, 1, 1), 20.0, 0.0, 50, 1000, "x", 250.0, 0, 0, 1.0, 0.0, 0.0),
        ("OK", "OK", dt.datetime(2023, 1, 1), 20.0, 0.0, 50, 1000, "x", 1.0, 0, 0, 1.0, 0.0, 0.0),
    ]
    df = validate(spark.createDataFrame(rows, RAW_SCHEMA))
    assert [r["city"] for r in df.select("city").collect()] == ["OK"]
