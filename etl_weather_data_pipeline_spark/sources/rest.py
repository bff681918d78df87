"""Driver-side REST source (SURVEY §2.1 S1/S2).

Fetching a rate-limited third-party API is driver work, not cluster work:
1 call/second (the reference's free-tier ceiling, src/ingest.py:146-147)
means parallelism buys nothing and a 1000-executor fan-out would DoS the
endpoint. So: fetch on the driver with retry/backoff, then
``spark.createDataFrame(rows, RAW_SCHEMA)`` hands the batch to the engine.

The HTTP client is injectable so tests (and environments without
``requests``) never touch the network.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from etl_weather_data_pipeline_spark.schemas import RAW_SCHEMA

RETRY_STATUSES = {429, 500, 502, 503, 504}


def _default_http_get(url: str, params: dict[str, Any], timeout: float) -> dict:
    try:
        import requests  # gated: not guaranteed in every runtime
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "requests not available; inject http_get= into fetch_* instead"
        ) from e
    resp = requests.get(url, params=params, timeout=timeout)
    resp.raise_for_status()
    return resp.json()


def fetch_city(
    city: str,
    country_code: str,
    api_key: str,
    http_get: Callable[..., dict] | None = None,
    base_url: str = "https://api.openweathermap.org/data/2.5/weather",
    retries: int = 3,
    backoff: float = 1.0,
    timeout: float = 10.0,
) -> dict | None:
    """S1 — fetch one city's current weather payload with retry/backoff
    (reference src/ingest.py:63-120). Returns the raw JSON dict or None.

    Only transient failures retry: HTTP statuses in ``RETRY_STATUSES``
    (429/5xx — the reference's urllib3 ``status_forcelist``,
    src/ingest.py:66-71) and connection-level errors (no response at
    all). A definitive HTTP error (401 bad key, 404 unknown city) fails
    fast — retrying it burns the whole backoff budget per city to reach
    the same answer."""
    http_get = http_get or _default_http_get
    params = {"q": f"{city},{country_code}", "units": "metric", "appid": api_key}
    for attempt in range(retries + 1):
        try:
            return http_get(base_url, params, timeout)
        except Exception as e:
            status = getattr(
                getattr(e, "response", None), "status_code", None
            )
            retryable = status is None or status in RETRY_STATUSES
            if not retryable or attempt == retries:
                return None
            time.sleep(backoff * (2**attempt))
    return None


def fetch_cities_df(
    spark: SparkSession,
    cities: list[dict[str, str]],
    api_key: str,
    http_get: Callable[..., dict] | None = None,
    rate_limit_s: float = 1.0,
) -> DataFrame:
    """S2 — multi-city fetch at <= 1 call/sec, failures dropped
    (reference src/ingest.py:122-150); lands as a typed DataFrame via the
    same declarative parse as the file source."""
    import json as _json

    from etl_weather_data_pipeline_spark.sources.readers import parse_api_payload

    payloads: list[str] = []
    for i, c in enumerate(cities):
        data = fetch_city(c["city"], c["country_code"], api_key, http_get)
        if data is not None:
            payloads.append(_json.dumps(data))
        if i < len(cities) - 1 and rate_limit_s:
            time.sleep(rate_limit_s)
    if not payloads:
        return spark.createDataFrame([], RAW_SCHEMA)
    raw = spark.createDataFrame([(p,) for p in payloads], "value string")
    return parse_api_payload(raw, "value")
