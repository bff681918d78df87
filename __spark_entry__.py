"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` are generated from the engine's query
catalog (etl_weather_data_pipeline_spark/plans/) — one entry per operator
from SURVEY.md §2 plus the LLM-data-pipeline extensions. Queries without a
SQL-expressible oracle (streaming, iterative) simply have no oracle_sql
entry and get the driver's rows-only check.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from etl_weather_data_pipeline_spark.plans.catalog import build_registry

_REGISTRY = build_registry()

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the complete reference transform surface (clean → hourly dedup →
    null handling incl. median imputation → normalize → 26-col enrich →
    validate) over a weather table derived from the events stream.
    """
    return _REGISTRY["weather_pipeline_e2e"].spark(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark for name, q in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirror for each oracle-checkable query."""
    return {
        name: q.oracle for name, q in _REGISTRY.items() if q.oracle is not None
    }
