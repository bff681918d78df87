"""Source tests (SURVEY §2.1 S1-S5) — ports the reference's ingest suite
(tests/test_ingest.py): mocked HTTP, retry/failure behavior, rate-limit
call counts, nested JSON parse incl. m→km conversion, config fallback."""

from __future__ import annotations

import json

import pytest

from etl_weather_data_pipeline_spark.sources.readers import (
    load_cities,
    parse_api_payload,
    read_api_json,
    read_raw_csv,
)
from etl_weather_data_pipeline_spark.sources.rest import fetch_cities_df, fetch_city

API_PAYLOAD = {
    "coord": {"lon": -0.1278, "lat": 51.5074},
    "weather": [
        {"id": 801, "main": "Clouds", "description": "Partly Cloudy", "icon": "02d"}
    ],
    "main": {
        "temp": 15.5, "feels_like": 14.2, "temp_min": 14.0, "temp_max": 17.0,
        "pressure": 1013, "humidity": 65,
    },
    "visibility": 10000,
    "wind": {"speed": 3.2, "deg": 180},
    "clouds": {"all": 40},
    "dt": 1699358400,
    "sys": {"type": 1, "id": 1, "country": "GB", "sunrise": 0, "sunset": 0},
    "timezone": 0, "id": 2643743, "name": "London", "cod": 200,
}


def test_parse_api_payload(spark):
    """S3 — m→km, epoch→ts, nested flatten (reference src/ingest.py:152-169)."""
    raw = spark.createDataFrame([(json.dumps(API_PAYLOAD),)], "value string")
    row = parse_api_payload(raw).first()
    assert row["city"] == "London" and row["country"] == "GB"
    assert row["visibility"] == 10.0  # 10000 m -> 10 km
    assert row["temperature"] == 15.5 and row["humidity"] == 65
    assert row["wind_speed"] == 3.2 and row["wind_direction"] == 180
    assert row["timestamp"].year == 2023
    assert row["description"] == "Partly Cloudy"


def test_parse_api_payload_defaults(spark):
    """Missing wind/visibility default to 0 (reference src/ingest.py:163-166)."""
    p = {k: v for k, v in API_PAYLOAD.items() if k not in ("wind", "visibility")}
    raw = spark.createDataFrame([(json.dumps(p),)], "value string")
    row = parse_api_payload(raw).first()
    assert row["wind_speed"] == 0.0
    assert row["wind_direction"] == 0
    assert row["visibility"] == 0.0


def test_fetch_city_retries_then_none():
    """S1 — errors retry with backoff then return None
    (reference src/ingest.py:79-120)."""
    calls = []

    def failing(url, params, timeout):
        calls.append(params["q"])
        raise IOError("boom")

    out = fetch_city("London", "GB", "key", http_get=failing, retries=2, backoff=0)
    assert out is None
    assert len(calls) == 3  # initial + 2 retries


def test_fetch_cities_df_drops_failures(spark):
    """S2 — failed cities are dropped; successes land typed
    (reference src/ingest.py:122-150)."""

    def http(url, params, timeout):
        if params["q"].startswith("Bad"):
            raise IOError("nope")
        return API_PAYLOAD

    cities = [
        {"city": "London", "country_code": "GB"},
        {"city": "Bad", "country_code": "XX"},
    ]
    df = fetch_cities_df(spark, cities, "key", http_get=http, rate_limit_s=0)
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["city"] == "London"


def test_load_cities_fallback_and_file(spark, tmp_path):
    """S4 — config file read with hard-coded fallback
    (reference src/ingest.py:192-213)."""
    fallback = load_cities(spark)
    assert fallback.count() == 10
    cfg = tmp_path / "cities.json"
    cfg.write_text(json.dumps({"cities": [{"city": "Oslo", "country_code": "NO"}]}))
    loaded = load_cities(spark, str(cfg))
    assert [r["city"] for r in loaded.collect()] == ["Oslo"]


def test_read_raw_csv_schema_enforced(spark, tmp_path, clean_raw):
    """S5 — CSV round-trip keeps types (no re-inference; the reference's
    CSV hand-off hazard, weather_etl_dag.py:182,251-255)."""
    path = str(tmp_path / "csv")
    clean_raw.write.option("header", True).csv(path)
    back = read_raw_csv(spark, path)
    # CSV sources surface every column as nullable; names and types must
    # round-trip exactly (the reference re-infers and gets them wrong)
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in clean_raw.schema.fields
    ]
    assert back.count() == 3


def test_read_api_json_lines(spark, tmp_path):
    f = tmp_path / "landed.json"
    f.write_text("\n".join([json.dumps(API_PAYLOAD)] * 3))
    df = read_api_json(spark, str(f))
    assert df.count() == 3
    assert df.schema["timestamp"].dataType.typeName() == "timestamp"


def test_orc_round_trip(spark, tmp_path, clean_raw):
    """ORC sink/reader round-trip: schema and values survive exactly, and
    predicate pushdown works on the columnar scan."""
    from etl_weather_data_pipeline_spark.sinks.writers import write_orc
    from etl_weather_data_pipeline_spark.sources.readers import read_orc

    path = str(tmp_path / "orc")
    write_orc(clean_raw, path)
    back = read_orc(spark, path)
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in clean_raw.schema.fields
    ]
    assert back.count() == 3
    plan = back.filter(back.city == "London")._jdf.queryExecution().toString()
    assert "PushedFilters" in plan and "London" in plan


def test_read_jsonl_corpus_schema_and_provenance(spark, tmp_path):
    rows = [
        {"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "s0", "n_chars": 10},
        {"doc_id": 2, "text": "gamma", "lang": "de", "source": "s1", "n_chars": 5},
    ]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    from etl_weather_data_pipeline_spark.sources.readers import read_jsonl_corpus

    df = read_jsonl_corpus(spark, str(tmp_path))
    got = {r["doc_id"]: r for r in df.collect()}
    assert set(got) == {1, 2}
    assert got[1]["text"] == "alpha beta" and got[2]["lang"] == "de"
    assert all(r["source_file"].endswith("docs.jsonl") for r in got.values())
    # schema enforced, not inferred
    assert dict(df.dtypes)["doc_id"] == "bigint"


def test_read_text_corpus_stable_ids(spark, tmp_path):
    (tmp_path / "a.txt").write_text("line one\nline two\n")
    (tmp_path / "b.txt").write_text("line one\n")
    from etl_weather_data_pipeline_spark.sources.readers import read_text_corpus

    df = read_text_corpus(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 3
    # ids are content-addressed: same text in DIFFERENT files differs,
    # and a re-read (fresh plan, possibly different splits) reproduces them
    ids1 = sorted(r["doc_id"] for r in rows)
    ids2 = sorted(r["doc_id"] for r in read_text_corpus(spark, str(tmp_path)).collect())
    assert ids1 == ids2 and len(set(ids1)) == 3

    whole = read_text_corpus(spark, str(tmp_path), whole_files=True).collect()
    assert len(whole) == 2
    texts = {r["source_file"].rsplit("/", 1)[-1]: r["text"] for r in whole}
    assert texts["a.txt"] == "line one\nline two\n"


def test_read_jsonl_corpus_corrupt_records(spark, tmp_path):
    lines = [
        json.dumps({"doc_id": 1, "text": "good", "lang": "en", "source": "s", "n_chars": 4}),
        "{this is not json",
        json.dumps({"doc_id": 2, "text": "also good", "lang": "en", "source": "s", "n_chars": 9}),
    ]
    (tmp_path / "mixed.jsonl").write_text("\n".join(lines))
    from etl_weather_data_pipeline_spark.sources.readers import read_jsonl_corpus

    # default: malformed lines dropped, ingest keeps flowing
    ok = read_jsonl_corpus(spark, str(tmp_path))
    assert sorted(r["doc_id"] for r in ok.collect()) == [1, 2]

    # quarantine mode: corrupt line survives with the raw text attached
    kept = read_jsonl_corpus(spark, str(tmp_path), keep_corrupt=True)
    rows = kept.collect()
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(rows) == 3 and len(bad) == 1
    assert bad[0]["_corrupt_record"].startswith("{this")


def test_write_csv_json_sinks_round_trip(spark, tmp_path, clean_raw):
    """K1/K2 — the CSV and JSON-lines sinks round-trip rows and honor
    append mode (the reference writes both formats from every stage,
    src/load.py; here they are thin mode-parameterized writers)."""
    from etl_weather_data_pipeline_spark.sinks.writers import (
        write_csv,
        write_json,
    )
    from etl_weather_data_pipeline_spark.sources.readers import (
        read_raw_csv,
    )

    csv_path = str(tmp_path / "csv_sink")
    write_csv(clean_raw, csv_path)
    back = read_raw_csv(spark, csv_path)
    assert back.count() == 3
    assert sorted(r["city"] for r in back.select("city").collect()) == sorted(
        r["city"] for r in clean_raw.select("city").collect()
    )
    write_csv(clean_raw, csv_path, mode="append")
    assert read_raw_csv(spark, csv_path).count() == 6

    json_path = str(tmp_path / "json_sink")
    write_json(clean_raw, json_path)
    jback = spark.read.json(json_path)
    assert jback.count() == 3
    assert set(clean_raw.columns) <= set(jback.columns)
    write_json(clean_raw, json_path, mode="append")
    assert spark.read.json(json_path).count() == 6


def test_register_views_enables_sql(spark):
    """register_views exposes every testdata table to spark.sql —
    the SQL entry point a reference user would reach for first."""
    from etl_weather_data_pipeline_spark.sources.readers import (
        read_table,
        register_views,
    )

    from tests.conftest import SF_SMOKE

    register_views(spark, SF_SMOKE)
    for t in ("documents", "events", "nation"):
        n_sql = spark.sql(f"SELECT COUNT(*) AS n FROM {t}").first()["n"]
        assert n_sql == read_table(spark, SF_SMOKE, t).count()


def test_parse_api_payload_drops_unparseable_and_keyless(spark):
    """Corrupt payloads and payloads missing an identity field
    (name/sys.country/dt) are dropped — reference parity: its parser
    KeyErrors on required fields and the record is skipped
    (src/ingest.py:113-118). Without the drop they became NULL-keyed
    rows the upsert can never match."""
    no_dt = {k: v for k, v in API_PAYLOAD.items() if k != "dt"}
    no_name = {k: v for k, v in API_PAYLOAD.items() if k != "name"}
    raw = spark.createDataFrame(
        [
            (json.dumps(API_PAYLOAD),),
            ("{not json at all",),
            (json.dumps(no_dt),),
            (json.dumps(no_name),),
        ],
        "value string",
    )
    rows = parse_api_payload(raw).collect()
    assert len(rows) == 1
    assert rows[0]["city"] == "London"
    assert rows[0]["timestamp"] is not None


def test_fetch_city_fails_fast_on_definitive_http_error():
    """Only transient statuses (RETRY_STATUSES) and connection errors
    retry; a definitive 401/404 returns None on the FIRST attempt
    (reference status_forcelist, src/ingest.py:66-71)."""

    class FakeResponse:
        def __init__(self, status_code):
            self.status_code = status_code

    class FakeHTTPError(Exception):
        def __init__(self, status_code):
            super().__init__(f"http {status_code}")
            self.response = FakeResponse(status_code)

    calls = []

    def unauthorized(url, params, timeout):
        calls.append(1)
        raise FakeHTTPError(401)

    assert (
        fetch_city("London", "GB", "bad", http_get=unauthorized, retries=3, backoff=0)
        is None
    )
    assert len(calls) == 1  # no retries burned on a definitive answer

    calls.clear()

    def throttled(url, params, timeout):
        calls.append(1)
        if len(calls) < 3:
            raise FakeHTTPError(429)
        return API_PAYLOAD

    out = fetch_city("London", "GB", "key", http_get=throttled, retries=3, backoff=0)
    assert out == API_PAYLOAD
    assert len(calls) == 3  # 429 IS retryable
