"""etl_weather_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference ``vezzil/etl-weather-data-pipeline`` (a
pandas/SQLAlchemy weather ETL pipeline), extended with the operators a
large-scale training-data pipeline needs (dedup, similarity search,
text analysis, multimodal plumbing).

Design principles (see SURVEY.md §7):

- **DataFrame/SQL first** — every operator is a declarative plan handed to
  Catalyst; no hand-scheduled execution, no row-at-a-time loops.
- **No Python UDFs in the hot path** — the reference's ``Series.apply``
  bucketing functions become native ``when``-chains; Python appears only in
  Arrow-batched ``pandas_udf`` / ``applyInPandas`` for genuinely
  non-relational logic.
- **Scale-out by construction** — aggregations are partial+final, small
  dimensions broadcast, dedup/similarity use blocking keys so no operator is
  quadratic in the full table.
"""

__version__ = "0.1.0"

from etl_weather_data_pipeline_spark.session import get_spark  # noqa: F401
