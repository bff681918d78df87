"""Property-based invariants (hypothesis) for the transform pipeline, plus
the bucketed co-located join test.

The reference's tests pin specific boundary values; these assert the
contract holds for arbitrary inputs: no out-of-range value, null critical
field, or duplicate (city, country, hour) can survive transform_weather.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_weather_data_pipeline_spark.schemas import ENRICHED_COLUMNS, RAW_SCHEMA
from etl_weather_data_pipeline_spark.transform import transform_weather

_finite = st.floats(
    min_value=-1e4, max_value=1e4, allow_nan=False, allow_infinity=False
)

_row = st.tuples(
    st.sampled_from([" london ", "Paris", "  new york", "x"]),  # city
    st.sampled_from(["gb", "FR", " us "]),  # country
    st.datetimes(
        min_value=dt.datetime(2020, 1, 1), max_value=dt.datetime(2025, 1, 1)
    ),
    st.one_of(st.none(), _finite),  # temperature
    st.one_of(st.none(), _finite),  # feels_like
    st.one_of(st.none(), st.integers(-50, 200)),  # humidity
    st.one_of(st.none(), st.integers(0, 2000)),  # pressure
    st.sampled_from([" OK ", "clear", ""]),  # description
    st.one_of(st.none(), _finite),  # wind_speed
    st.one_of(st.none(), st.integers(-720, 720)),  # wind_direction
    st.one_of(st.none(), st.integers(-50, 200)),  # cloudiness
    st.one_of(st.none(), _finite),  # visibility
    st.one_of(st.none(), _finite),  # lat
    st.one_of(st.none(), _finite),  # lon
)

VALID_SEASONS = {"Winter", "Spring", "Summer", "Autumn"}
VALID_TEMP = {"Freezing", "Cold", "Cool", "Mild", "Warm", "Hot"}
VALID_HUM = {"Low", "Moderate", "High"}
VALID_WIND = {"Calm", "Light", "Gentle", "Moderate", "Fresh", "Strong", "Gale"}


@settings(max_examples=6, deadline=None)
@given(st.lists(_row, min_size=1, max_size=40))
def test_transform_invariants(spark, rows):
    df = spark.createDataFrame(rows, RAW_SCHEMA)
    out = transform_weather(df)
    collected = out.collect()
    assert out.columns == ENRICHED_COLUMNS
    assert len(collected) <= len(rows)
    seen_keys = set()
    for r in collected:
        # range contracts (P3-P6 + E4-E6)
        assert -60 <= r["temperature"] <= 60
        assert 800 <= r["pressure"] <= 1100
        assert 0 <= r["humidity"] <= 100
        assert 0 <= r["cloudiness"] <= 100
        assert 0 <= r["wind_direction"] < 360
        assert r["wind_speed"] <= 200
        assert r["visibility"] >= 0
        assert -90 <= r["lat"] <= 90 and -180 <= r["lon"] <= 180
        # no critical nulls (P2), imputation applied (N1/N2)
        for c in ("temperature", "humidity", "pressure", "lat", "lon",
                  "wind_speed", "wind_direction", "visibility"):
            assert r[c] is not None, c
        # enrichment contracts (E12-E19)
        assert r["season"] in VALID_SEASONS
        assert r["temp_category"] in VALID_TEMP
        assert r["humidity_category"] in VALID_HUM
        assert r["wind_category"] in VALID_WIND
        assert 0 <= r["quality_score"] <= 100
        assert r["location"] == f"{r['city']}, {r['country']}"
        # dedup contract (D1): unique (city, country, hour-truncated ts)
        key = (r["city"], r["country"], r["timestamp"].replace(
            minute=0, second=0, microsecond=0))
        assert key not in seen_keys
        seen_keys.add(key)


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key co-locates the join: with
    broadcast disabled, the sort-merge join must run with ZERO exchanges —
    the storage layout replaces the shuffle (the 100 TB join strategy)."""
    import re

    from etl_weather_data_pipeline_spark.plans.catalog import load

    orders = load(spark, "/root/testdata/sf0.001", "orders")
    customer = load(spark, "/root/testdata/sf0.001", "customer")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    (orders.write.mode("overwrite")
        .option("path", str(tmp_path / "b_orders"))
        .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders"))
    (customer.write.mode("overwrite")
        .option("path", str(tmp_path / "b_customer"))
        .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = spark._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan
        assert not re.findall(r"^\(\d+\) Exchange", plan, re.M), plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
