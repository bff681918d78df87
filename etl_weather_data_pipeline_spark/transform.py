"""Weather observation transform pipeline.

Re-expresses the reference's eager five-stage pandas pipeline
(reference src/transform.py:40-69: convert → clean → normalize → enrich →
validate) as pure DataFrame→DataFrame functions composed into ONE lazy
lineage. Catalyst then reorders/pushes filters into the scan — the
reference copies the whole frame at every stage
(src/transform.py:86,129,157,190); we never materialize anything until the
caller acts.

The only genuine pipeline breaker is median imputation (N2,
src/transform.py:112): an aggregate feeding a fill is inherently two-pass.
It is implemented as an explicit 1-row agg broadcast into the projection and
documented as the one extra job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_weather_data_pipeline_spark.functions import weather as WX
from etl_weather_data_pipeline_spark.schemas import CRITICAL_FIELDS


def dedup_hourly(df: DataFrame) -> DataFrame:
    """D1 — keep the earliest observation per (city, country, hour).

    The reference floors the timestamp to the hour and keeps the
    first-encountered row (src/transform.py:85-92) — order-dependent in
    pandas. Distributed engines have no 'encounter order', so we make the
    semantic explicit and deterministic: earliest ``timestamp`` wins (ties
    broken by the full measure tuple). One shuffle on the dedup key.
    """
    key_hour = F.date_trunc("hour", F.col("timestamp"))
    w = Window.partitionBy(F.col("city"), F.col("country"), key_hour).orderBy(
        F.col("timestamp"), F.col("temperature"), F.col("pressure")
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def clean_text(df: DataFrame) -> DataFrame:
    """E1-E3 — normalize city/country/description strings."""
    return (
        df.withColumn("city", WX.clean_city(F.col("city")))
        .withColumn("country", WX.clean_country(F.col("country")))
        .withColumn("description", WX.clean_description(F.col("description")))
    )


def handle_missing(df: DataFrame) -> DataFrame:
    """P2 + N1 + N2 — drop critical nulls, constant-fill wind, median-fill
    visibility (reference src/transform.py:104-123).

    N2 stays IN the plan: the exact median (Spark >= 3.4) is a 1-row
    aggregate branch broadcast-joined back into the projection. The
    aggregate branch and the main branch share the identical upstream
    (scan → clean → dedup exchange), so exchange reuse executes that
    shuffle ONCE — unlike an eager ``.first()`` pre-pass, which re-runs
    the whole upstream as a second job (O(full input) twice at scale).
    """
    out = df.na.drop(subset=CRITICAL_FIELDS)
    out = out.na.fill({"wind_speed": 0.0, "wind_direction": 0})
    med = out.agg(
        F.coalesce(F.median("visibility"), F.lit(0.0)).alias("__median_vis")
    )
    return (
        out.crossJoin(F.broadcast(med))
        .withColumn(
            "visibility", F.coalesce(F.col("visibility"), F.col("__median_vis"))
        )
        .drop("__median_vis")
    )


def normalize(df: DataFrame) -> DataFrame:
    """E4-E7 — clip/wrap/round measures (reference src/transform.py:125-151)."""
    return (
        df.withColumn("humidity", WX.clip(F.col("humidity"), 0, 100))
        .withColumn("cloudiness", WX.clip(F.col("cloudiness"), 0, 100))
        .withColumn("wind_direction", WX.wrap_degrees(F.col("wind_direction")))
        .withColumn("visibility", WX.clip(F.col("visibility"), lo=0))
        .withColumn("temperature", WX.round_to(F.col("temperature"), 1))
        .withColumn("feels_like", WX.round_to(F.col("feels_like"), 1))
        .withColumn("wind_speed", WX.round_to(F.col("wind_speed"), 1))
        .withColumn("visibility", WX.round_to(F.col("visibility"), 1))
        .withColumn("lat", WX.round_to(F.col("lat"), 6))
        .withColumn("lon", WX.round_to(F.col("lon"), 6))
    )


def enrich(df: DataFrame) -> DataFrame:
    """E8-E19 — widen to the 26-column contract
    (reference src/transform.py:153-184)."""
    ts, t, h = F.col("timestamp"), F.col("temperature"), F.col("humidity")
    return (
        df.withColumn("date", WX.obs_date(ts))
        .withColumn("hour", WX.obs_hour(ts))
        .withColumn("day_of_week", WX.day_name(ts))
        .withColumn("month", WX.month_name(ts))
        .withColumn("season", WX.season(ts))
        .withColumn("temp_category", WX.temp_category(t))
        .withColumn("humidity_category", WX.humidity_category(h))
        .withColumn("wind_category", WX.wind_category(F.col("wind_speed")))
        .withColumn("comfort_index", WX.comfort_index(t, h))
        .withColumn("location", WX.location(F.col("city"), F.col("country")))
        .withColumn("coord_string", WX.coord_string(F.col("lat"), F.col("lon")))
        .withColumn(
            "quality_score",
            WX.quality_score(t, F.col("wind_speed"), F.col("visibility")),
        )
    )


def validate(df: DataFrame) -> DataFrame:
    """P3-P6 — physical-range filters (reference src/transform.py:186-216).

    Kept as one conjunctive filter so Catalyst can push the whole predicate
    into the parquet scan when the pipeline reads from storage.
    """
    return df.filter(
        F.col("temperature").between(-60, 60)
        & F.col("pressure").between(800, 1100)
        & (F.col("wind_speed") <= 200)
        & F.col("lat").between(-90, 90)
        & F.col("lon").between(-180, 180)
    )


def transform_weather(df: DataFrame) -> DataFrame:
    """Full pipeline: clean → dedup → missing → normalize → enrich → validate.

    Text cleaning precedes dedup so the dedup key sees normalized city/
    country values (' london '/'gb' collides with 'London'/'GB', matching
    the reference's dedup test, tests/test_transform.py:65-88); validation
    runs last so the range filters see normalized values.
    """
    out = clean_text(df)
    out = dedup_hourly(out)
    out = handle_missing(out)
    out = normalize(out)
    out = enrich(out)
    return validate(out)
