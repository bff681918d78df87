"""LLM training-data pipeline queries (dedup / similarity / text analysis).

Filled in incrementally; see operators/dedup.py and operators/similarity.py
for the underlying operators.
"""

from __future__ import annotations

from etl_weather_data_pipeline_spark.plans.catalog import Query

QUERIES: list[Query] = []
