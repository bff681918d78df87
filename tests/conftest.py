from __future__ import annotations

import datetime as dt
import sys
from pathlib import Path

import pytest

# Make `pytest /root/repo/tests` collect from ANY cwd (the repo's own
# hostile-session verification doctrine): the package and __spark_entry__
# live at the repo root, which isn't on sys.path unless pytest was started
# there.
_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from etl_weather_data_pipeline_spark.schemas import RAW_SCHEMA
from etl_weather_data_pipeline_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: bench-scale (sf0.1) checks — deselect with -m 'not slow'",
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=4, shuffle_partitions=4)
    yield s


TS = dt.datetime(2023, 11, 7, 12, 0, 0)

# The reference's three clean fixture rows (tests/conftest.py:12-64 → FIXTURES.md §1).
CLEAN_ROWS = [
    ("London", "GB", TS, 15.5, 14.2, 65, 1013, "partly cloudy", 3.2, 180, 40, 10.0, 51.5074, -0.1278),
    ("New York", "US", TS, 18.0, 17.5, 70, 1015, "clear sky", 2.8, 90, 0, 12.0, 40.7128, -74.0060),
    ("Tokyo", "JP", TS, 22.3, 21.8, 55, 1020, "sunny", 1.5, 45, 10, 15.0, 35.6762, 139.6503),
]

# All-invalid row (reference tests/conftest.py:100-119).
INVALID_ROW = (
    "", "GB", TS, 999.0, None, 150, -100, "bad", -5.0, 450, 120, -1.0, 200.0, -200.0,
)


@pytest.fixture()
def clean_raw(spark):
    return spark.createDataFrame(CLEAN_ROWS, RAW_SCHEMA)


@pytest.fixture()
def dirty_raw(spark):
    rows = CLEAN_ROWS + [
        INVALID_ROW,
        # duplicate of London within the same hour, dirty text
        (" london ", "gb", TS.replace(minute=30), 16.0, 15.0, 66, 1014,
         " PARTLY CLOUDY ", 3.0, 170, 42, 11.0, 51.5074, -0.1278),
        # nulls: critical (temperature) → dropped; non-critical → imputed
        ("Oslo", "NO", TS, None, 1.0, 80, 1000, "snow", None, None, 90, None, 59.9, 10.8),
        ("Lima", "PE", TS, 19.0, 18.5, 60, 1012, "mist", None, None, 50, None, -12.0, -77.0),
    ]
    return spark.createDataFrame(rows, RAW_SCHEMA)
