"""Flagship weather-pipeline demo over the synthetic testdata.

Derives a deterministic weather-observation table from ``events`` and runs
the full reference transform surface against a hand-mirrored SQL oracle.
Filled in after the relational batch.
"""

from __future__ import annotations

from etl_weather_data_pipeline_spark.plans.catalog import Query

QUERIES: list[Query] = []
