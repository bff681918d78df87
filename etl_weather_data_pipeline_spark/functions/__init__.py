"""Expression library: native Column-expression building blocks.

Everything here compiles to Catalyst expressions (whole-stage codegen,
no Python in the executor hot path).
"""

from etl_weather_data_pipeline_spark.functions import text, vector, weather  # noqa: F401
