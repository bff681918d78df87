"""Streaming tests: landing-dir ingest → watermark dedup → windowed aggs →
foreachBatch merge, plus custom stateful operator. Driven synchronously
via memory sink / processAllAvailable."""

from __future__ import annotations

import datetime as dt
import json
import shutil

import pytest

from etl_weather_data_pipeline_spark.streaming.pipeline import (
    start_merge_sink,
    stream_raw,
    transform_stream,
    windowed_city_aggs,
)


@pytest.fixture()
def landing(tmp_path):
    """JSON-lines landing dir with 2 cities x 3 hours + same-hour dup."""
    rows = []
    base = dt.datetime(2023, 11, 7, 12, 0, 0)
    for city, country, lat, lon in [("London", "GB", 51.5, -0.12), ("Tokyo", "JP", 35.6, 139.6)]:
        for h in range(3):
            rows.append(
                dict(
                    city=city, country=country,
                    timestamp=(base + dt.timedelta(hours=h)).isoformat(),
                    temperature=15.0 + h, feels_like=14.0 + h, humidity=60,
                    pressure=1013, description="ok", wind_speed=3.0,
                    wind_direction=180, cloudiness=40, visibility=10.0,
                    lat=lat, lon=lon,
                )
            )
    # same-hour duplicate for London (dropDuplicates should eat it)
    dup = dict(rows[0])
    dup["timestamp"] = (base + dt.timedelta(minutes=30)).isoformat()
    dup["temperature"] = 99.0
    rows.append(dup)
    d = tmp_path / "landing"
    d.mkdir()
    (d / "batch1.json").write_text("\n".join(json.dumps(r) for r in rows))
    return str(d)


def _run_to_memory(sdf, name):
    q = (
        sdf.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_streaming_transform_dedup(spark, landing):
    out = transform_stream(stream_raw(spark, landing))
    _run_to_memory(out, "stream_enriched")
    rows = spark.sql("SELECT * FROM stream_enriched").collect()
    # 6 unique (city, hour) slots; the same-hour dup was dropped
    assert len(rows) == 6
    assert all(r["temperature"] < 99.0 for r in rows)
    assert {r["city"] for r in rows} == {"London", "Tokyo"}
    assert len(rows[0].asDict()) == 26  # full enriched contract


def test_streaming_windowed_aggs(spark, landing):
    agg = windowed_city_aggs(stream_raw(spark, landing), window="1 hour")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_aggs")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # append mode only emits windows the watermark has closed; with a
    # single batch the final windows stay open, so check via complete mode
    q2 = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_aggs_complete")
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    rows = spark.sql(
        "SELECT * FROM stream_aggs_complete ORDER BY city, window_start"
    ).collect()
    assert len(rows) == 6  # 2 cities x 3 hourly windows
    london_first = rows[0]
    assert london_first["city"] == "London"
    assert london_first["record_count"] == 2  # original + same-hour dup
    assert london_first["min_temperature"] == 15.0
    assert london_first["max_temperature"] == 99.0


def test_streaming_merge_sink_idempotent(spark, landing, tmp_path):
    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    out = transform_stream(stream_raw(spark, landing))
    q = start_merge_sink(out, wh, ckpt)
    q.processAllAvailable()
    q.stop()
    stored = spark.read.parquet(f"{wh}/weather_data")
    assert stored.count() == 6
    # replay the same data through a fresh checkpoint -> merge keeps keys
    shutil.rmtree(ckpt)
    q2 = start_merge_sink(
        transform_stream(stream_raw(spark, landing)), wh, str(tmp_path / "ckpt2")
    )
    q2.processAllAvailable()
    q2.stop()
    assert spark.read.parquet(f"{wh}/weather_data").count() == 6


def test_stateful_running_stats(spark, tmp_path):
    from etl_weather_data_pipeline_spark.streaming.state import (
        running_stats_per_key,
    )

    d = tmp_path / "events_landing"
    d.mkdir()
    rows = [
        {"k": "a", "v": 1.0}, {"k": "a", "v": 3.0},
        {"k": "b", "v": 10.0}, {"k": "b", "v": 20.0}, {"k": "b", "v": 30.0},
    ]
    (d / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    sdf = spark.readStream.schema("k string, v double").json(str(d))
    out = running_stats_per_key(sdf, "k", "v")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_stats")
        .start()
    )
    q.processAllAvailable()
    # second batch arrives -> state must carry over
    (d / "b2.json").write_text(json.dumps({"k": "a", "v": 5.0}))
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(
        "SELECT * FROM stateful_stats ORDER BY key, n"
    ).collect()
    final_a = [r for r in rows if r["key"] == "a"][-1]
    final_b = [r for r in rows if r["key"] == "b"][-1]
    assert (final_a["n"], final_a["total"], final_a["vmin"], final_a["vmax"]) == (3, 9.0, 1.0, 5.0)
    assert (final_b["n"], final_b["total"], final_b["vmin"], final_b["vmax"]) == (3, 60.0, 10.0, 30.0)


def test_stream_static_join_enriches(spark, landing):
    from etl_weather_data_pipeline_spark.streaming.pipeline import (
        enrich_stream_with_dim,
    )

    dim = spark.createDataFrame(
        [("London", "GB", "Europe/London"), ("Tokyo", "JP", "Asia/Tokyo")],
        "city string, country string, tz string",
    )
    out = enrich_stream_with_dim(
        stream_raw(spark, landing), dim, on=["city", "country"]
    )
    _run_to_memory(out, "stream_dimjoin")
    rows = spark.sql("SELECT city, tz FROM stream_dimjoin").collect()
    assert len(rows) == 7  # stateless: every input row passes through
    assert {(r["city"], r["tz"]) for r in rows} == {
        ("London", "Europe/London"),
        ("Tokyo", "Asia/Tokyo"),
    }


def test_stream_stream_join_within_window(spark, tmp_path):
    import datetime as dt

    from etl_weather_data_pipeline_spark.streaming.pipeline import (
        join_streams_within,
    )

    base = dt.datetime(2023, 11, 7, 12, 0, 0)
    ldir, rdir = tmp_path / "l", tmp_path / "r"
    ldir.mkdir(); rdir.mkdir()
    lrows = [{"k": "a", "timestamp": base.isoformat(), "lv": 1}]
    rrows = [
        {"k": "a", "timestamp": (base + dt.timedelta(minutes=30)).isoformat(), "rv": 10},
        {"k": "a", "timestamp": (base + dt.timedelta(hours=2)).isoformat(), "rv": 20},
        {"k": "b", "timestamp": (base + dt.timedelta(minutes=5)).isoformat(), "rv": 30},
    ]
    (ldir / "b1.json").write_text("\n".join(json.dumps(x) for x in lrows))
    (rdir / "b1.json").write_text("\n".join(json.dumps(x) for x in rrows))
    left = spark.readStream.schema("k string, timestamp timestamp, lv long").json(str(ldir))
    right = spark.readStream.schema("k string, timestamp timestamp, rv long").json(str(rdir))
    out = join_streams_within(left, right, key="k", within="1 hour").select(
        "l.k", "lv", "rv"
    )
    _run_to_memory(out, "stream_joined")
    rows = spark.sql("SELECT * FROM stream_joined").collect()
    # only the rv=10 row is the same key AND within [ts, ts+1h]
    assert [(r["k"], r["lv"], r["rv"]) for r in rows] == [("a", 1, 10)]


def test_streaming_multimodal_decode(spark, tmp_path):
    """The Arrow mapInPandas decode runs under Structured Streaming too:
    binary payloads land as parquet, stream through decode_features, and
    produce the same deterministic features as the batch path."""
    from pyspark.sql import functions as F

    from etl_weather_data_pipeline_spark.streaming.multimodal import (
        decode_features,
    )

    landing = tmp_path / "payloads"
    batch = spark.range(8).select(
        F.col("id").alias("doc_id"),
        F.encode(F.concat(F.lit("payload-"), F.col("id")), "utf-8").alias(
            "payload"
        ),
    )
    batch.write.parquet(str(landing))
    sdf = spark.readStream.schema("doc_id long, payload binary").parquet(
        str(landing)
    )
    out = decode_features(sdf)
    _run_to_memory(out, "stream_decoded")
    got = {
        r["doc_id"]: (r["byte_len"], r["checksum"])
        for r in spark.sql("SELECT * FROM stream_decoded").collect()
    }
    want = {
        r["doc_id"]: (r["byte_len"], r["checksum"])
        for r in decode_features(batch).collect()
    }
    assert got == want and len(got) == 8


def test_streaming_session_windows(spark, tmp_path):
    import datetime as dt

    from etl_weather_data_pipeline_spark.streaming.pipeline import (
        sessionized_city_aggs,
    )

    base = dt.datetime(2023, 11, 7, 12, 0, 0)
    d = tmp_path / "landing"
    d.mkdir()
    rows = [
        # London: two obs 10 min apart (one session), then one 2h later
        dict(city="London", country="GB", timestamp=base.isoformat(),
             temperature=15.0, feels_like=14.0, humidity=60, pressure=1013,
             description="ok", wind_speed=3.0, wind_direction=180,
             cloudiness=40, visibility=10.0, lat=51.5, lon=-0.12),
    ]
    rows.append(dict(rows[0], timestamp=(base + dt.timedelta(minutes=10)).isoformat()))
    rows.append(dict(rows[0], timestamp=(base + dt.timedelta(hours=2)).isoformat(),
                     temperature=17.0))
    (d / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    agg = sessionized_city_aggs(stream_raw(spark, str(d)), gap="30 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName("stream_sessions").start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql(
        "SELECT * FROM stream_sessions ORDER BY session_start"
    ).collect()
    assert len(got) == 2  # 30-min gap splits the 2h-later obs into its own
    assert got[0]["n_obs"] == 2 and got[1]["n_obs"] == 1
    # session end = last event + gap
    assert (got[0]["session_end"] - got[0]["session_start"]).seconds == 40 * 60


def test_stream_stream_left_outer_join_emits_on_watermark(spark, tmp_path):
    import datetime as dt

    from etl_weather_data_pipeline_spark.streaming.pipeline import (
        join_streams_within,
    )

    base = dt.datetime(2023, 11, 7, 12, 0, 0)
    ldir, rdir = tmp_path / "l", tmp_path / "r"
    ldir.mkdir(); rdir.mkdir()
    (ldir / "b1.json").write_text(json.dumps(
        {"k": "a", "timestamp": base.isoformat(), "lv": 1}))
    (rdir / "b1.json").write_text(json.dumps(
        {"k": "b", "timestamp": base.isoformat(), "rv": 9}))
    left = spark.readStream.schema("k string, timestamp timestamp, lv long").json(str(ldir))
    right = spark.readStream.schema("k string, timestamp timestamp, rv long").json(str(rdir))
    out = join_streams_within(
        left, right, key="k", within="10 minutes", watermark="10 minutes",
        how="left_outer",
    ).select("l.k", "lv", "rv")
    q = (
        out.writeStream.outputMode("append")
        .format("memory").queryName("stream_louter").start()
    )
    q.processAllAvailable()
    first = spark.sql("SELECT * FROM stream_louter").collect()
    # no match yet AND watermark hasn't passed -> nothing emitted
    assert first == []
    # a much later event on BOTH sides pushes the watermark past the
    # left row's match window -> the null-padded row must flush
    late = (base + dt.timedelta(hours=3)).isoformat()
    (ldir / "b2.json").write_text(json.dumps({"k": "zz", "timestamp": late, "lv": 0}))
    (rdir / "b2.json").write_text(json.dumps({"k": "zz", "timestamp": late, "rv": 0}))
    q.processAllAvailable()
    q.processAllAvailable()
    q.stop()
    rows = {(r["k"], r["lv"], r["rv"]) for r in spark.sql("SELECT * FROM stream_louter").collect()}
    assert ("a", 1, None) in rows


def test_streaming_corpus_curation(spark, tmp_path):
    """Streaming quality gate + watermarked fingerprint dedup: low-quality
    docs dropped, exact duplicates within the watermark collapse to one,
    output lands partitioned by lang."""
    import json as _json

    from etl_weather_data_pipeline_spark.streaming.corpus import (
        curate_stream,
        start_corpus_append_sink,
        stream_docs,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    base = "2024-01-01T00:{m:02d}:00"
    good = "the quick brown fox jumps over the lazy dog near the old river bank today"
    rows = [
        {"doc_id": 1, "text": good, "lang": "en", "source": "s0",
         "ingest_ts": base.format(m=1)},
        # exact duplicate content (same fingerprint) -> must collapse
        {"doc_id": 2, "text": good, "lang": "en", "source": "s1",
         "ingest_ts": base.format(m=2)},
        # degenerate repetition -> 'repetitive' bucket -> dropped
        {"doc_id": 3, "text": "spam spam spam spam spam spam spam spam",
         "lang": "en", "source": "s0", "ingest_ts": base.format(m=3)},
        # too short -> dropped
        {"doc_id": 4, "text": "tiny", "lang": "de", "source": "s2",
         "ingest_ts": base.format(m=3)},
        # distinct good doc, other lang -> kept
        {"doc_id": 5, "text": good + " with a different tail appended here",
         "lang": "de", "source": "s2", "ingest_ts": base.format(m=4)},
    ]
    with open(landing / "batch0.json", "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")

    curated = curate_stream(stream_docs(spark, str(landing)))
    out = tmp_path / "corpus"
    q = start_corpus_append_sink(
        curated, str(out), str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(120)

    stored = spark.read.parquet(str(out))
    got = {r["doc_id"]: r for r in stored.collect()}
    assert set(got) == {1, 5}, got  # dup 2 collapsed; 3, 4 gated out
    assert all(r["quality_bucket"] == "ok" for r in got.values())
    import glob as _glob

    langs = {p.split("=")[-1] for p in _glob.glob(f"{out}/lang=*")}
    assert langs == {"en", "de"}


def test_corpus_merge_sink_full_history_dedup(spark, tmp_path):
    """Store-probing merge: a second landing file that repeats old content
    (outside any watermark horizon) appends only its genuinely new docs,
    and replaying the whole landing dir from a FRESH checkpoint appends
    nothing — idempotent under at-least-once replay."""
    import json as _json

    from etl_weather_data_pipeline_spark.streaming.corpus import (
        start_corpus_merge_sink,
        stream_docs,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    store = str(tmp_path / "corpus")

    def doc(i, text):
        return dict(
            doc_id=i, text=text, lang="en", source="crawl",
            ingest_ts="2024-01-01T00:00:00",
        )

    (landing / "b1.json").write_text(
        "\n".join(_json.dumps(doc(i, f"doc number {i} body")) for i in range(5))
    )
    sdf = stream_docs(spark, str(landing))
    q = start_corpus_merge_sink(sdf, store, str(tmp_path / "ck1")).start()
    q.processAllAvailable(); q.stop()
    assert spark.read.parquet(store).count() == 5

    # day 2: 3 repeats of old content (new ids) + 2 new docs
    (landing / "b2.json").write_text(
        "\n".join(
            _json.dumps(doc(100 + i, f"doc number {i} body")) for i in range(3)
        )
        + "\n"
        + "\n".join(_json.dumps(doc(200 + i, f"fresh {i}")) for i in range(2))
    )
    q = start_corpus_merge_sink(
        stream_docs(spark, str(landing)), store, str(tmp_path / "ck1")
    ).start()
    q.processAllAvailable(); q.stop()
    stored = spark.read.parquet(store)
    assert stored.count() == 7  # 5 + 2 new, repeats skipped
    assert stored.filter("doc_id >= 200").count() == 2

    # full replay from a fresh checkpoint: store probe blocks everything
    q = start_corpus_merge_sink(
        stream_docs(spark, str(landing)), store, str(tmp_path / "ck2")
    ).start()
    q.processAllAvailable(); q.stop()
    assert spark.read.parquet(store).count() == 7


def test_merge_batch_drops_null_fingerprints(spark, tmp_path):
    """NULL-text rows can't be fingerprinted, and a NULL key never matches
    the left-anti store probe — without the guard every at-least-once
    replay would re-append them. The merge must drop them and stay
    idempotent (the round-5 ADVICE hazard, exercised directly)."""
    from etl_weather_data_pipeline_spark.streaming.corpus import (
        merge_batch_into_corpus,
    )

    store = str(tmp_path / "store")
    batch = spark.createDataFrame(
        [(1, "real body"), (2, None), (3, None)],
        "doc_id long, text string",
    )
    assert merge_batch_into_corpus(batch, store) == 1
    assert merge_batch_into_corpus(batch, store) == 0, (
        "replay re-appended NULL-fingerprint rows"
    )
    assert spark.read.parquet(store).count() == 1


def test_neardup_merge_sink_blocks_near_and_exact_dups(spark, tmp_path):
    """Near-dup-aware store merge: exact repeats die at the fingerprint
    stage, NEAR repeats (edited copies, not byte-identical) die at the
    band-probe + Jaccard stage against the persisted store band table,
    within-batch near-dups collapse to the smaller id, and replay from a
    fresh checkpoint appends nothing. The store's _bands side table stays
    hidden from the document read and covers exactly the survivors."""
    import json as _json

    from etl_weather_data_pipeline_spark.streaming.corpus import (
        BANDS_SUBDIR,
        start_corpus_neardup_merge_sink,
        stream_docs,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    store = str(tmp_path / "corpus")
    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the afternoon sun"
    )

    def doc(i, text):
        return dict(
            doc_id=i, text=text, lang="en", source="crawl",
            ingest_ts="2024-01-01T00:00:00",
        )

    # batch 1: one base doc, one unrelated doc, and an in-batch near-dup
    # pair (30, 31) — only 30 may survive
    (landing / "b1.json").write_text(
        "\n".join(
            _json.dumps(d)
            for d in [
                doc(0, base),
                doc(1, "completely different content about spark plans"),
                doc(30, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
                doc(31, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
            ]
        )
    )
    q = start_corpus_neardup_merge_sink(
        stream_docs(spark, str(landing)), store, str(tmp_path / "ck1")
    ).start()
    q.processAllAvailable(); q.stop()
    stored = spark.read.parquet(store)
    ids1 = {r["doc_id"] for r in stored.select("doc_id").collect()}
    assert ids1 == {0, 1, 30}, ids1

    # batch 2: exact repeat (new id), near-dup edit of the base doc, and
    # one genuinely new doc
    (landing / "b2.json").write_text(
        "\n".join(
            _json.dumps(d)
            for d in [
                doc(100, base),                     # exact dup -> dropped
                doc(101, base + " tonight"),        # near dup  -> dropped
                doc(102, "entirely new material on dedup funnel reports"),
            ]
        )
    )
    q = start_corpus_neardup_merge_sink(
        stream_docs(spark, str(landing)), store, str(tmp_path / "ck1")
    ).start()
    q.processAllAvailable(); q.stop()
    stored = spark.read.parquet(store)
    ids2 = {r["doc_id"] for r in stored.select("doc_id").collect()}
    assert ids2 == {0, 1, 30, 102}, ids2

    # _bands: hidden from the doc read (above), one entry set per survivor
    bands = spark.read.parquet(f"{store}/{BANDS_SUBDIR}")
    assert {r["doc_id"] for r in bands.select("doc_id").distinct().collect()} == ids2

    # full replay from a FRESH checkpoint appends nothing (idempotent)
    q = start_corpus_neardup_merge_sink(
        stream_docs(spark, str(landing)), store, str(tmp_path / "ck2")
    ).start()
    q.processAllAvailable(); q.stop()
    assert spark.read.parquet(store).count() == 4


def test_neardup_merge_rebuilds_bands_for_legacy_store(spark, tmp_path):
    """A store created by the exact-only sink (no _bands) is upgraded in
    place: the first near-dup merge rebuilds the band table from stored
    text and then blocks near-dups against it."""
    from etl_weather_data_pipeline_spark.streaming.corpus import (
        BANDS_SUBDIR,
        merge_batch_into_corpus,
        merge_batch_neardup_into_corpus,
    )

    store = str(tmp_path / "corpus")
    base = (
        "one two three four five six seven eight nine ten eleven twelve "
        "thirteen fourteen fifteen sixteen"
    )
    legacy = spark.createDataFrame(
        [(1, base)], "doc_id long, text string"
    )
    assert merge_batch_into_corpus(legacy, store) == 1
    import os

    assert not os.path.isdir(f"{store}/{BANDS_SUBDIR}")
    batch = spark.createDataFrame(
        [(2, base + " seventeen"), (3, "unrelated words only here")],
        "doc_id long, text string",
    )
    assert merge_batch_neardup_into_corpus(batch, store) == 1
    ids = {r["doc_id"] for r in spark.read.parquet(store).collect()}
    assert ids == {1, 3}, ids
    assert os.path.isdir(f"{store}/{BANDS_SUBDIR}")


def test_neardup_sink_agrees_with_batch_incremental_funnel(spark, tmp_path):
    """The streaming near-dup merge and the batch incremental funnel
    implement ONE admission policy (exact anti-join; near-dup where the
    store always wins and the smaller id wins within a batch), via
    different mechanics (persisted band-table probe vs union-LSH). On
    the same (store, batch) inputs with the md5 family they must admit
    EXACTLY the same documents — a drift between the streaming and
    batch planners fails here."""
    from pyspark.sql import functions as F

    from etl_weather_data_pipeline_spark.operators.dedup import dedup_exact
    from etl_weather_data_pipeline_spark.plans import llmops
    from etl_weather_data_pipeline_spark.plans.catalog import load
    from etl_weather_data_pipeline_spark.streaming.corpus import (
        merge_batch_into_corpus,
        merge_batch_neardup_into_corpus,
    )

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    batch = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id", "text")
    store_raw = docs.filter(F.col("doc_id") % 5 != 0)

    # batch path
    llmops.release_curation_cache()
    store = dedup_exact(store_raw).select("doc_id", "text")
    _, _, b2 = llmops.incremental_funnel(store, batch)
    funnel_admitted = {r["doc_id"] for r in b2.collect()}
    llmops.release_curation_cache()

    # streaming path: build the SAME store via the exact-only merge
    # (min-id semantics match dedup_exact), then near-dup-merge the batch
    # — the sink rebuilds the band table from the legacy store in place
    spath = str(tmp_path / "corpus")
    merge_batch_into_corpus(
        store_raw.select("doc_id", "text"), spath, hash_family="md5"
    )
    before = {r["doc_id"] for r in spark.read.parquet(spath).collect()}
    merge_batch_neardup_into_corpus(batch, spath, hash_family="md5")
    after = {r["doc_id"] for r in spark.read.parquet(spath).collect()}
    sink_admitted = after - before

    assert sink_admitted == funnel_admitted, (
        sorted(sink_admitted ^ funnel_admitted)
    )


def test_corpus_ingest_history_audit_rows(spark, tmp_path):
    """Every merge writes one audit row to _ingest_history (even a
    no-op replay), the counts decompose the batch exactly
    (n_batch = exact_dropped + neardup_dropped + appended), the appended
    column sums to the store size, and the audit dir stays hidden from
    the document read."""
    from etl_weather_data_pipeline_spark.streaming.corpus import (
        INGEST_HISTORY_SUBDIR,
        merge_batch_into_corpus,
        merge_batch_neardup_into_corpus,
    )

    store = str(tmp_path / "corpus")
    base = (
        "shared sentence about weather data pipelines running on spark "
        "clusters every single day without fail"
    )
    b1 = spark.createDataFrame(
        [(1, base), (2, base), (3, "some other unrelated text entirely")],
        "doc_id long, text string",
    )
    assert merge_batch_into_corpus(b1, store) == 2  # 2 kept 1 exact dup
    b2 = spark.createDataFrame(
        [(10, base), (11, base + " tonight"), (12, "brand new content here")],
        "doc_id long, text string",
    )
    assert merge_batch_neardup_into_corpus(b2, store) == 1  # only 12
    assert merge_batch_neardup_into_corpus(b2, store) == 0  # replay

    hist = spark.read.parquet(f"{store}/{INGEST_HISTORY_SUBDIR}").collect()
    assert len(hist) == 3
    for r in hist:
        assert (
            r["n_batch"]
            == r["n_exact_dropped"] + r["n_neardup_dropped"] + r["n_appended"]
        ), r
    assert sum(r["n_appended"] for r in hist) == 3
    assert spark.read.parquet(store).count() == 3  # audit dir hidden
    by_appended = sorted(
        (r["n_batch"], r["n_exact_dropped"], r["n_neardup_dropped"], r["n_appended"])
        for r in hist
    )
    # replay row: 10 and 12 die at the exact stage (they ARE stored);
    # 11 was near-dup-dropped before, so it is not in the store and is
    # re-dropped at the near-dup stage again — (3, 2, 1, 0)
    assert by_appended == [(3, 1, 0, 2), (3, 1, 1, 1), (3, 2, 1, 0)], by_appended


def test_neardup_band_probe_reads_store_in_place(spark, tmp_path):
    """The band-table scale contract (r6 verdict directive): the store's
    _bands table is a catalog table bucketed on the probe's join key
    (band_idx, band_val), so the per-batch vs-store candidate join reads
    the corpus-sized band table IN PLACE and shuffles only the batch's
    bands — the same contract the bucketed fingerprint store pins in
    test_properties.py::test_bucketed_store_probe_shuffles_batch_only."""
    import re

    from pyspark.sql import functions as F

    from etl_weather_data_pipeline_spark.operators.dedup import (
        minhash_band_table,
        minhash_signatures,
    )
    from etl_weather_data_pipeline_spark.streaming.corpus import (
        bands_table_name,
        merge_batch_neardup_into_corpus,
    )

    store = str(tmp_path / "corpus")
    b1 = spark.createDataFrame(
        [(i, f"document number {i} about topic {i % 3} with words") for i in range(20)],
        "doc_id long, text string",
    )
    assert merge_batch_neardup_into_corpus(b1, store, band_buckets=8) > 0

    batch = spark.createDataFrame(
        [(100, "a fresh probe document"), (101, "another probe text")],
        "doc_id long, text string",
    )
    bt = minhash_band_table(
        minhash_signatures(batch, "text", "doc_id", 8, hash_family="xxhash64"),
        "doc_id", 8, 4,
    ).select(F.col("doc_id").alias("id_b"), "band_idx", "band_val")
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at real scale the batch exceeds any broadcast threshold; force
        # the shuffle-join path the pin is about
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        probe = (
            spark.table(bands_table_name(store))
            .select(F.col("doc_id").alias("id_a"), "band_idx", "band_val")
            .join(bt, ["band_idx", "band_val"])
            .select("id_a", "id_b")
        )
        plan = spark._jvm.PythonSQLUtils.explainString(
            probe._jdf.queryExecution(), "formatted"
        )
        # the store subtree (left join child, ':'-prefixed tree lines)
        # must contain NO Exchange — the bucketed scan feeds the join in
        # place; the batch side keeps its own 2 (signature aggregate +
        # bucket alignment), both batch-sized
        store_side_exchanges = re.findall(r"^\s*:.*Exchange", plan, re.M)
        assert store_side_exchanges == [], plan
        n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
        assert n_exchange == 2, plan
        assert "Bucketed: true" in plan, plan
        assert "SelectedBucketsCount: 8 out of 8" in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)


def test_compact_corpus_side_tables(spark, tmp_path):
    """Side-table maintenance (r6 verdict directive): per-batch appends
    accumulate small files in _bands and _ingest_history forever;
    compact_corpus_side_tables rewrites the band table to one file per
    non-empty bucket WITHOUT losing the bucketed layout (the no-shuffle
    probe plan survives), compacts the audit log, changes no rows, and
    the sink keeps working (replay still appends nothing)."""
    import glob
    import os

    from etl_weather_data_pipeline_spark.streaming.corpus import (
        BANDS_SUBDIR,
        INGEST_HISTORY_SUBDIR,
        bands_table_name,
        compact_corpus_side_tables,
        merge_batch_neardup_into_corpus,
    )

    store = str(tmp_path / "corpus")
    batches = [
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        [(2, "one two three four five six seven eight nine")],
        [(3, "red orange yellow green blue indigo violet colors")],
    ]
    for rows in batches:
        df = spark.createDataFrame(rows, "doc_id long, text string")
        assert merge_batch_neardup_into_corpus(df, store, band_buckets=4) == 1

    bands_path = f"{store}/{BANDS_SUBDIR}"
    hist_path = f"{store}/{INGEST_HISTORY_SUBDIR}"
    name = bands_table_name(store)
    before_rows = sorted(
        tuple(r) for r in spark.table(name).collect()
    )
    files_before = len(glob.glob(os.path.join(bands_path, "*.parquet")))
    hist_before = len(glob.glob(os.path.join(hist_path, "*.parquet")))
    assert files_before > 4  # 3 appends x non-empty buckets
    assert hist_before >= 3  # one audit file per merge

    out = compact_corpus_side_tables(spark, store, band_buckets=4)
    assert out["bands"]["files_after"] <= 4 < out["bands"]["files_before"]
    assert out["ingest_history"]["files_after"] < hist_before

    # identical content, still registered, still bucketed
    after_rows = sorted(tuple(r) for r in spark.table(name).collect())
    assert after_rows == before_rows
    hist = spark.read.parquet(hist_path)
    assert hist.count() == 3
    # the bucketed layout survives compaction: a join on the bucket key
    # still reads the store side in place (a bare scan intentionally
    # reads unbucketed — autoBucketedScan demotes it when no operator
    # benefits, so the pin must be on a join plan)
    from pyspark.sql import functions as F

    probe_side = spark.createDataFrame(
        [(0, "x")], "band_idx int, band_val string"
    )
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table(name).join(probe_side, ["band_idx", "band_val"])
        plan = spark._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    # the sink still functions against the compacted side tables
    replay = spark.createDataFrame(
        batches[0], "doc_id long, text string"
    )
    assert merge_batch_neardup_into_corpus(replay, store, band_buckets=4) == 0


@pytest.mark.slow
def test_compact_ivf_index_folds_cell_files(spark, tmp_path):
    """Stage-4 index maintenance (the vectors_ivf branch of
    compact_corpus_side_tables, previously only reachable in
    production): every semantic merge appends one file per TOUCHED
    cell under _vectors_ivf/vectors/cell=*/, so streaming cadence
    grows the probe's file count linearly; the compaction folds each
    cell partition to one file WITHOUT moving any row across cells
    (the store invariant partition pruning rests on), changes no
    vector, and the read-only judge admits the identical set across
    the rewrite."""
    import glob
    import math
    import os

    from pyspark.sql import functions as F

    from etl_weather_data_pipeline_spark.operators import ann_index as AX
    from etl_weather_data_pipeline_spark.streaming.corpus import (
        VECTORS_IVF_SUBDIR,
        compact_corpus_side_tables,
        judge_batch_against_store,
        merge_batch_neardup_into_corpus,
    )

    store = str(tmp_path / "corpus")

    def doc(i):
        text = " ".join(f"tok{i}w{j}" for j in range(8))
        vec = [math.cos(i * 0.5), math.sin(i * 0.5), 0.0, 0.0]
        return (i, text, [float(x) for x in vec])

    schema = "doc_id long, text string, embedding array<float>"
    # golden-ish angular spacing: every pairwise cosine stays below the
    # 0.999 threshold (worst wraparound pair i-j=13 -> cos(0.217 rad)
    # ~= 0.9766), so all 18 docs survive stage 4 and index
    cfg = dict(
        band_buckets=4,
        embedding_col="embedding",
        semantic_cells=2,
        semantic_threshold=0.999,
        semantic_bootstrap_centroids=[
            [1.0, 0.0, 0.0, 0.0],
            [-1.0, 0.0, 0.0, 0.0],
        ],
    )
    for b in range(3):
        rows = [doc(i) for i in range(b * 6, b * 6 + 6)]
        df = spark.createDataFrame(rows, schema)
        assert merge_batch_neardup_into_corpus(df, store, **cfg) == 6

    vroot = f"{store}/{VECTORS_IVF_SUBDIR}"
    vdir = f"{vroot}/{AX.VECTORS_SUBDIR}"
    cell_dirs = sorted(glob.glob(os.path.join(vdir, "cell=*")))
    assert len(cell_dirs) == 2, cell_dirs  # both centroids touched
    files_per_cell_before = {
        d: len(glob.glob(os.path.join(d, "*.parquet"))) for d in cell_dirs
    }
    # each batch touched both cells -> 3 append files per cell
    assert all(n >= 2 for n in files_per_cell_before.values()), (
        files_per_cell_before
    )
    vec_before = sorted(
        map(repr, (tuple(r) for r in AX.read_ivf_vectors(spark, vroot).collect()))
    )

    # probe batch: one planted semantic twin of an indexed doc (distinct
    # tokens, vector scaled 1.001 -> cosine 1.0) + one genuinely fresh
    # direction ([0,0,1,0] is orthogonal to every indexed vector)
    twin_vec = [float(x * 1.001) for x in doc(4)[2]]
    probe = spark.createDataFrame(
        [
            (100, "planted pa pb pc pd pe pf pg", twin_vec),
            (101, "fresh fa fb fc fd fe ff fg", [0.0, 0.0, 1.0, 0.0]),
        ],
        schema,
    )
    jargs = dict(
        band_buckets=4, embedding_col="embedding",
        semantic_threshold=0.999,
    )
    rep_before = judge_batch_against_store(probe, store, **jargs)
    kept_before = sorted(
        r["doc_id"] for r in rep_before["survivors"].select("doc_id").collect()
    )
    assert kept_before == [101], kept_before  # twin dropped, fresh kept

    out = compact_corpus_side_tables(spark, store, band_buckets=4)
    assert "vectors_ivf" in out, out
    assert (
        out["vectors_ivf"]["files_after"]
        < out["vectors_ivf"]["files_before"]
    ), out
    # exactly one file per non-empty cell, rows byte-identical, and no
    # row changed cells (read back WITH the partition column)
    for d in cell_dirs:
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1, d
    vec_after = sorted(
        map(repr, (tuple(r) for r in AX.read_ivf_vectors(spark, vroot).collect()))
    )
    assert vec_after == vec_before
    rep_after = judge_batch_against_store(probe, store, **jargs)
    kept_after = sorted(
        r["doc_id"] for r in rep_after["survivors"].select("doc_id").collect()
    )
    assert kept_after == kept_before
    assert {
        k: rep_after[k] for k in ("n_batch", "n_after_exact", "n_survivors")
    } == {
        k: rep_before[k] for k in ("n_batch", "n_after_exact", "n_survivors")
    }


def test_neardup_merge_migrates_plain_bands_layout(spark, tmp_path):
    """A pre-bucketing store (plain-parquet _bands, no catalog entry) is
    migrated in place on first touch: the merge detects the unbucketed
    file layout, rewrites it through the crash-safe stager, and carries
    on with identical admission semantics."""
    import glob
    import os
    import re

    from etl_weather_data_pipeline_spark.streaming.corpus import (
        BANDS_SUBDIR,
        bands_table_name,
        merge_batch_neardup_into_corpus,
    )

    store = str(tmp_path / "corpus")
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    b1 = spark.createDataFrame(
        [(1, base), (2, "totally different text about bucketed tables")],
        "doc_id long, text string",
    )
    assert merge_batch_neardup_into_corpus(b1, store, band_buckets=4) == 2

    # simulate the legacy layout: demote the band table to plain parquet
    # (collect first — an in-place overwrite cannot read what it deletes)
    name = bands_table_name(store)
    bands_path = f"{store}/{BANDS_SUBDIR}"
    rows = spark.table(name).collect()
    spark.sql(f"DROP TABLE {name}")
    import shutil as _sh

    _sh.rmtree(bands_path)
    spark.createDataFrame(
        rows, "doc_id long, band_idx int, band_val string"
    ).coalesce(1).write.parquet(bands_path)
    assert all(
        re.search(r"_(\d{5})\.", os.path.basename(f)) is None
        for f in glob.glob(os.path.join(bands_path, "*.parquet"))
    )

    # first merge against the legacy layout migrates + still blocks dups
    b2 = spark.createDataFrame(
        [(10, base + " today"), (11, "genuinely novel content right here")],
        "doc_id long, text string",
    )
    assert merge_batch_neardup_into_corpus(b2, store, band_buckets=4) == 1
    ids = {r["doc_id"] for r in spark.read.parquet(store).collect()}
    assert ids == {1, 2, 11}, ids
    assert spark.catalog.tableExists(name)
    assert all(
        re.search(r"_(\d{5})\.", os.path.basename(f)) is not None
        for f in glob.glob(os.path.join(bands_path, "*.parquet"))
    )


def test_fingerprint_probe_never_shuffles_store(spark, tmp_path):
    """The exact-stage store probe (the sink's idempotency mechanism)
    must SCAN the store but never SHUFFLE it: a plain left_anti can only
    broadcast the store side, so at store scale it degenerates into
    re-shuffling every stored fingerprint per micro-batch. The two-step
    broadcast probe (_probe_fresh) pins the shape: two
    BroadcastHashJoins, no sort-merge/shuffled-hash join anywhere, and
    the only shuffle Exchange is the batch-side key distinct."""
    import re

    from pyspark.sql import functions as F

    from etl_weather_data_pipeline_spark.functions import text as TX
    from etl_weather_data_pipeline_spark.streaming.corpus import (
        _probe_fresh,
        merge_batch_into_corpus,
    )

    store = str(tmp_path / "corpus")
    b1 = spark.createDataFrame(
        [(i, f"stored document number {i} with body text") for i in range(30)],
        "doc_id long, text string",
    )
    assert merge_batch_into_corpus(b1, store) == 30

    batch = spark.createDataFrame(
        [(100, "stored document number 3 with body text"),
         (101, "a new document entirely")],
        "doc_id long, text string",
    ).withColumn("fingerprint", TX.fingerprint(F.col("text"), "xxhash64"))
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at store scale nothing auto-broadcasts; the probe's broadcasts
        # are explicit hints, so they must survive threshold -1
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fresh = _probe_fresh(
            batch, spark.read.parquet(store).select("fingerprint")
        )
        plan = spark._jvm.PythonSQLUtils.explainString(
            fresh._jdf.queryExecution(), "formatted"
        )
        assert len(re.findall(r"BroadcastHashJoin", plan)) >= 2, plan
        assert "SortMergeJoin" not in plan, plan
        assert "ShuffledHashJoin" not in plan, plan
        # only shuffle: the batch-side fingerprint distinct
        n_shuffle = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
        assert n_shuffle <= 1, plan
        # semantics unchanged: the stored twin is dropped, the new doc kept
        ids = {r["doc_id"] for r in fresh.collect()}
        assert ids == {101}, ids
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)


def test_neardup_sink_inline_compaction(spark, tmp_path):
    """compact_every folds side-table maintenance into the sink: after a
    multi-batch run the band table sits at <= band_buckets files and the
    store still blocks duplicates (compaction is serialized with merges
    inside foreachBatch, so there is no concurrent-writer window)."""
    import glob
    import json as _json
    import os

    from etl_weather_data_pipeline_spark.streaming.corpus import (
        BANDS_SUBDIR,
        start_corpus_neardup_merge_sink,
        stream_docs,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    store = str(tmp_path / "corpus")

    def doc(i, text):
        return dict(
            doc_id=i, text=text, lang="en", source="crawl",
            ingest_ts="2024-01-01T00:00:00",
        )

    (landing / "b1.json").write_text(
        _json.dumps(doc(1, "alpha beta gamma delta epsilon zeta eta"))
    )
    (landing / "b2.json").write_text(
        _json.dumps(doc(2, "one two three four five six seven eight"))
    )
    q = start_corpus_neardup_merge_sink(
        stream_docs(spark, str(landing)), store, str(tmp_path / "ck"),
        band_buckets=4, compact_every=1,
    ).start()
    q.processAllAvailable(); q.stop()
    # maxFilesPerTrigger default ingests both files in one batch; force a
    # second batch with new data so batch_id 1 triggers the compaction
    (landing / "b3.json").write_text(
        "\n".join([
            _json.dumps(doc(3, "red orange yellow green blue indigo")),
            _json.dumps(doc(4, "alpha beta gamma delta epsilon zeta eta")),
        ])
    )
    q = start_corpus_neardup_merge_sink(
        stream_docs(spark, str(landing)), store, str(tmp_path / "ck"),
        band_buckets=4, compact_every=1,
    ).start()
    q.processAllAvailable(); q.stop()

    ids = {r["doc_id"] for r in spark.read.parquet(store).collect()}
    assert ids == {1, 2, 3}, ids  # 4 is an exact dup of 1
    n_band_files = len(
        glob.glob(os.path.join(store, BANDS_SUBDIR, "*.parquet"))
    )
    assert n_band_files <= 4, n_band_files


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


@pytest.mark.slow
def test_funnel_merge_sink_blocks_shared_passages(spark, tmp_path):
    """Stage-3 streaming dedup (passage_min_run): a batch doc sharing a
    long VERBATIM passage with a stored doc — but with enough unique
    filler that whole-doc Jaccard stays far below 0.5 — survives the
    LSH stage and must die at the winnow-blocked exact-passage stage
    (probing the store's persisted _winnow table). Within a batch the
    smaller id wins; replay appends nothing; without the passage stage
    the same doc is admitted (proving stage 3 is the difference)."""
    import os

    from etl_weather_data_pipeline_spark.streaming.corpus import (
        WINNOW_SUBDIR,
        merge_batch_neardup_into_corpus,
    )

    # passage P: 25 unique tokens (~170 normalized chars >> 23-char run
    # floor, >> 8 shared winnow fingerprints)
    P = _words("passagetoken", 25)
    P2 = _words("otherquote", 25)
    store = str(tmp_path / "corpus")
    b1 = spark.createDataFrame(
        [(1, P + " " + _words("storefill", 40)),
         (2, _words("unrelated", 30))],
        "doc_id long, text string",
    )
    assert merge_batch_neardup_into_corpus(
        b1, store, band_buckets=4, passage_min_run=16
    ) == 2
    assert os.path.isdir(f"{store}/{WINNOW_SUBDIR}")

    b2 = spark.createDataFrame(
        [
            (10, P + " " + _words("freshfill", 40)),   # quotes doc 1 -> drop
            (11, _words("brandnew", 30)),              # genuinely new -> keep
            (20, P2 + " " + _words("alphafill", 40)),  # within-batch pair:
            (21, P2 + " " + _words("betafill", 40)),   # 20 kept, 21 dropped
        ],
        "doc_id long, text string",
    )
    assert merge_batch_neardup_into_corpus(
        b2, store, band_buckets=4, passage_min_run=16
    ) == 2
    ids = {r["doc_id"] for r in spark.read.parquet(store).collect()}
    assert ids == {1, 2, 11, 20}, ids

    # _winnow covers exactly the survivors
    wf = spark.read.parquet(f"{store}/{WINNOW_SUBDIR}")
    assert {
        r["doc_id"] for r in wf.select("doc_id").distinct().collect()
    } == ids

    # replay: idempotent (everything dies at the exact stage)
    assert merge_batch_neardup_into_corpus(
        b2, store, band_buckets=4, passage_min_run=16
    ) == 0

    # control: WITHOUT stage 3 the passage-quoting doc is admitted
    store2 = str(tmp_path / "corpus_nostage3")
    assert merge_batch_neardup_into_corpus(b1, store2, band_buckets=4) == 2
    assert merge_batch_neardup_into_corpus(b2, store2, band_buckets=4) == 4


def test_funnel_merge_migrates_legacy_store_winnow(spark, tmp_path):
    """A store built by the stage-2-only sink (no _winnow) upgrades in
    place: the first passage-aware merge rebuilds the fingerprint table
    from stored text and then blocks passage-sharing docs against it."""
    import os

    from etl_weather_data_pipeline_spark.streaming.corpus import (
        WINNOW_SUBDIR,
        merge_batch_neardup_into_corpus,
    )

    P = _words("sharedpassage", 25)
    store = str(tmp_path / "corpus")
    b1 = spark.createDataFrame(
        [(1, P + " " + _words("oldfill", 40))],
        "doc_id long, text string",
    )
    assert merge_batch_neardup_into_corpus(b1, store, band_buckets=4) == 1
    assert not os.path.isdir(f"{store}/{WINNOW_SUBDIR}")

    b2 = spark.createDataFrame(
        [(10, P + " " + _words("newfill", 40)),
         (11, _words("elsewords", 30))],
        "doc_id long, text string",
    )
    assert merge_batch_neardup_into_corpus(
        b2, store, band_buckets=4, passage_min_run=16
    ) == 1
    ids = {r["doc_id"] for r in spark.read.parquet(store).collect()}
    assert ids == {1, 11}, ids
    assert os.path.isdir(f"{store}/{WINNOW_SUBDIR}")


def test_winnow_probe_and_stop_bound_read_store_in_place(spark, tmp_path):
    """Stage-3 store-side scale pins: (a) the df>max_df stop-fingerprint
    bound is a ZERO-exchange aggregate (the bucket key IS the group key,
    so the bucketed scan satisfies the aggregate's distribution), and
    (b) the fingerprint probe join reads the store-side _winnow table in
    place — no Exchange in the store subtree."""
    import re

    from pyspark.sql import functions as F

    from etl_weather_data_pipeline_spark.streaming.corpus import (
        merge_batch_neardup_into_corpus,
        winnow_table_name,
    )

    store = str(tmp_path / "corpus")
    b = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(30))) for i in range(10)],
        "doc_id long, text string",
    )
    assert merge_batch_neardup_into_corpus(
        b, store, band_buckets=4, passage_min_run=16
    ) == 10
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        w = spark.table(winnow_table_name(store))
        stop = (
            w.groupBy("fingerprint")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > 50)
        )
        p1 = spark._jvm.PythonSQLUtils.explainString(
            stop._jdf.queryExecution(), "formatted"
        )
        assert len(re.findall(r"^\(\d+\) Exchange", p1, re.M)) == 0, p1
        assert "Bucketed: true" in p1, p1

        batch_fps = spark.createDataFrame(
            [(100, 123), (101, 456)], "id_b long, fingerprint long"
        )
        probe = w.select(F.col("doc_id").alias("id_a"), "fingerprint").join(
            batch_fps, "fingerprint"
        )
        p2 = spark._jvm.PythonSQLUtils.explainString(
            probe._jdf.queryExecution(), "formatted"
        )
        assert re.findall(r"^\s*:.*Exchange", p2, re.M) == [], p2
        assert "Bucketed: true" in p2, p2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)


def test_passage_stage_single_winnow_scan_per_merge(spark, tmp_path):
    """r12 verdict directive #4 (the per-merge fixed floor): the stage-3
    store probe must read the _winnow side table in ONE batch-pruned
    pass — the old shape scanned the corpus-sized table twice per merge
    (store-wide stop-df aggregate + probe join). Pin: the blocking
    plan's NUMBERED nodes contain exactly one parquet scan of the
    winnow table (echoes inside InMemoryRelation cached-plan sections
    are unnumbered), and the pruned slice reaches it through a
    broadcast semi-join on the batch's fingerprint set. Admissions
    equivalence is gated separately (corpus_funnel_merge_state's
    relational replay hashes every stop bound)."""
    import re

    from etl_weather_data_pipeline_spark.streaming.corpus import (
        _passage_stage_drops,
        bands_table_name,
        merge_batch_neardup_into_corpus,
        winnow_table_name,
    )

    store = str(tmp_path / "corpus")
    b = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(30))) for i in range(10)],
        "doc_id long, text string",
    )
    assert merge_batch_neardup_into_corpus(
        b, store, band_buckets=4, passage_min_run=16
    ) == 10
    s2 = spark.createDataFrame(
        [(100 + i, " ".join(f"q{i}y{j}" for j in range(30)))
         for i in range(3)],
        "doc_id long, text string",
    ).localCheckpoint()
    persists: list = []
    try:
        pdrop, _ = _passage_stage_drops(
            spark, s2, spark.read.parquet(store), store, "text",
            "doc_id", 16, 8, 8, 4, 50, 4, persists=persists,
        )
        p = spark._jvm.PythonSQLUtils.explainString(
            pdrop._jdf.queryExecution(), "formatted"
        )
        wtbl = winnow_table_name(store).split(".")[-1]
        scans = re.findall(
            rf"^\(\d+\) Scan parquet .*{wtbl}", p, re.M
        )
        assert len(scans) == 1, (scans, p)
    finally:
        for c in persists:
            c.unpersist()
        spark.sql(f"DROP TABLE IF EXISTS {bands_table_name(store)}")
        spark.sql(f"DROP TABLE IF EXISTS {winnow_table_name(store)}")


def test_side_table_bucket_count_mismatch_rewrites(spark, tmp_path):
    """r7 ADVICE (medium): a _bands dir written with FEWER buckets than
    the requested count must NOT be re-attached as-is — an 8-bucket
    layout's file ids (0..7) are all < 64, so the old upper-bound check
    happily declared it INTO 64 BUCKETS and every bucketed probe assumed
    a hash%64 placement the files don't satisfy (silently admitted
    duplicates). The _n_buckets marker makes the true count provable:
    exact match -> zero-movement re-attach; ANY mismatch (or a
    pre-marker dir) -> staged bucketed rewrite. The behavioral check:
    after reopening an 8-bucket store with band_buckets=64, a near-dup
    of a stored doc is still blocked."""
    import glob
    import os

    from etl_weather_data_pipeline_spark.streaming.corpus import (
        BANDS_SUBDIR,
        _read_bucket_marker,
        bands_table_name,
        merge_batch_neardup_into_corpus,
    )

    store = str(tmp_path / "corpus")
    bands_path = f"{store}/{BANDS_SUBDIR}"
    base = "the quick brown fox jumps over the lazy dog near the river"
    b1 = spark.createDataFrame(
        [(1, base), (2, _words("unrelatedwords", 12))],
        "doc_id long, text string",
    )
    assert merge_batch_neardup_into_corpus(b1, store, band_buckets=8) == 2
    assert _read_bucket_marker(bands_path) == 8

    # simulate a session restart: catalog entry gone, files remain
    name = bands_table_name(store)
    spark.sql(f"DROP TABLE {name}")

    # reopening with the SAME count re-attaches without data movement
    files_before = sorted(glob.glob(os.path.join(bands_path, "*.parquet")))
    b_same = spark.createDataFrame(
        [(3, _words("freshcontent", 12))], "doc_id long, text string"
    )
    assert merge_batch_neardup_into_corpus(b_same, store, band_buckets=8) == 1
    assert set(files_before) <= set(
        glob.glob(os.path.join(bands_path, "*.parquet"))
    )

    # reopening with a LARGER count rewrites (marker updates to 64) and
    # the probe still blocks a near-duplicate of doc 1
    spark.sql(f"DROP TABLE {name}")
    b2 = spark.createDataFrame(
        [(10, base + " today"), (11, _words("novelmaterial", 12))],
        "doc_id long, text string",
    )
    assert merge_batch_neardup_into_corpus(b2, store, band_buckets=64) == 1
    assert _read_bucket_marker(bands_path) == 64
    ids = {r["doc_id"] for r in spark.read.parquet(store).collect()}
    assert ids == {1, 2, 3, 11}, ids


@pytest.mark.slow
def test_winnow_backfill_restores_stage3_coverage(spark, tmp_path):
    """r7 ADVICE (low): survivors appended while passage_min_run was OFF
    get no _winnow rows, and the existing-table branch never backfills
    them — stage 3 is then permanently blind to those docs.
    backfill_winnow_fingerprints (run automatically by
    compact_corpus_side_tables) anti-joins the gap and appends the
    missing fingerprint rows; a passage-quoting batch doc is then
    blocked against a doc that was appended during the off window."""
    from etl_weather_data_pipeline_spark.streaming.corpus import (
        WINNOW_SUBDIR,
        compact_corpus_side_tables,
        merge_batch_neardup_into_corpus,
    )

    P = _words("quotedpassage", 25)
    store = str(tmp_path / "corpus")
    b1 = spark.createDataFrame(
        [(1, _words("openingdoc", 30))], "doc_id long, text string"
    )
    assert merge_batch_neardup_into_corpus(
        b1, store, band_buckets=4, passage_min_run=16
    ) == 1

    # stage 3 toggled OFF: doc 2 (carrying passage P) gets no _winnow rows
    b2 = spark.createDataFrame(
        [(2, P + " " + _words("middlefill", 40))],
        "doc_id long, text string",
    )
    assert merge_batch_neardup_into_corpus(b2, store, band_buckets=4) == 1
    wf = spark.read.parquet(f"{store}/{WINNOW_SUBDIR}")
    assert {r["doc_id"] for r in wf.select("doc_id").distinct().collect()} == {1}

    # also land a doc too short to yield any fingerprint while stage 3
    # is off: it is a PERMANENT gap-doc (re-scanned every backfill) but
    # must never count as backfilled work (r8 ADVICE: the report was
    # permanently nonzero for stores holding short docs)
    b2s = spark.createDataFrame([(3, "")], "doc_id long, text string")
    assert merge_batch_neardup_into_corpus(b2s, store, band_buckets=4) == 1

    # without backfill, a quote of doc 2 slips through stage 3 — prove
    # the blindness on a throwaway copy of the batch id space, then
    # backfill and prove coverage
    out = compact_corpus_side_tables(spark, store, band_buckets=4)
    assert out["winnow"]["backfilled_rows"] > 0
    wf = spark.read.parquet(f"{store}/{WINNOW_SUBDIR}")
    assert {r["doc_id"] for r in wf.select("doc_id").distinct().collect()} == {1, 2}

    # steady state: nothing left to backfill — the short doc 3 is still
    # a gap doc by id but appends zero rows, so the report reads 0
    out2 = compact_corpus_side_tables(spark, store, band_buckets=4)
    assert out2["winnow"]["backfilled_rows"] == 0

    b3 = spark.createDataFrame(
        [(10, P + " " + _words("tailfill", 40)),  # quotes doc 2 -> drop
         (11, _words("distincttail", 30))],       # new -> keep
        "doc_id long, text string",
    )
    assert merge_batch_neardup_into_corpus(
        b3, store, band_buckets=4, passage_min_run=16
    ) == 1
    ids = {r["doc_id"] for r in spark.read.parquet(store).collect()}
    assert ids == {1, 2, 3, 11}, ids


def test_passage_stage_batch_boilerplate_stop(spark, tmp_path):
    """r8 scale fix: the within-batch winnow self-join now drops
    fingerprints with batch-df > max_df BEFORE blocking. Without the
    stop, a template-heavy batch is near-quadratic in candidates
    (measured at sf0.1: 2,500 docs -> 246,635 within-pairs, all
    unverifiable — the verify stage's gram max_occ bound drops those
    grams anyway), so the prune changes volume, not admissions.
    Behavioral: 60 docs sharing a boilerplate block are ALL admitted
    (boilerplate is not a passage-dup), while a planted unique-passage
    pair in the same batch is still deduped. Volume: the stopped
    within-join emits orders of magnitude fewer candidate pairs."""
    from pyspark.sql import functions as F

    from etl_weather_data_pipeline_spark.operators.passages import (
        winnow_fingerprint_table,
    )
    from etl_weather_data_pipeline_spark.streaming.corpus import (
        merge_batch_neardup_into_corpus,
    )

    boiler = _words("boilerplateblock", 30)
    P = _words("uniquepassage", 25)
    rows = [(i, boiler + " " + _words(f"tail{i}x", 25)) for i in range(60)]
    rows += [
        (100, P + " " + _words("alphatail", 25)),
        (101, P + " " + _words("betatail", 25)),
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string")

    # volume pin: batch-df>50 stop collapses the within-join candidates
    bfps = winnow_fingerprint_table(batch, 8, 4)
    stop = (
        bfps.groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > 50)
        .select("fingerprint")
    )
    def within_pairs(fps):
        l = fps.select(F.col("doc_id").alias("id_a"), "fingerprint")
        r = fps.select(F.col("doc_id").alias("id_b"), "fingerprint")
        return (
            l.join(r, "fingerprint")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= 8)
            .count()
        )
    unstopped = within_pairs(bfps)
    stopped = within_pairs(
        bfps.join(F.broadcast(stop), "fingerprint", "left_anti")
    )
    assert unstopped > 1000, unstopped  # near-quadratic without the stop
    # >90% candidate reduction (not exactly the planted pair alone:
    # tails share incidental 8-gram windows across the doc-id digits)
    assert stopped * 10 < unstopped, (stopped, unstopped)

    # behavior: boilerplate docs admitted, true passage pair deduped
    store = str(tmp_path / "corpus")
    n = merge_batch_neardup_into_corpus(
        batch, store, band_buckets=4, passage_min_run=16
    )
    ids = {r["doc_id"] for r in spark.read.parquet(store).collect()}
    assert 100 in ids and 101 not in ids, ids  # smaller id wins
    assert all(i in ids for i in range(60)), ids
    assert n == 61


def test_funnel_merge_action_discipline(spark, tmp_path, monkeypatch):
    """r9 perf contract: the three-stage merge pays the driver-side
    planning tax (every action re-plans its full analyzed tree —
    measured 1.75s per action on the cached survivors frame at sf0.1)
    as FEW times as possible. Pin the structure: per steady-state merge
    with the passage stage on, exactly 4 localCheckpoints (the stage-2
    lineage cut, the survivor set, band rows, winnow rows) and exactly
    10 persists (the flagged fingerprinted batch — history=True only;
    r15: ONE fused aggregate computes both history counts over it and
    warms the cache the survivor filter reads; fresh; bands table bt;
    the r15 multi-consumer
    intermediates — the vs-store band candidates, the verify token
    sets, and the flagged passage candidates, each consumed by 2-3
    branches that re-ran their subtrees unpersisted; and the passage
    stage's shared rolling-hash / winnow-fingerprint / pruned-store-
    winnow-slice / gram frames — the pruned slice is the r13
    single-scan store probe) — a regression to the
    count-then-checkpoint-from-cache shape shows up as extra
    checkpoints; a dropped lineage cut as a missing one."""
    from pyspark.sql.classic.dataframe import DataFrame

    from etl_weather_data_pipeline_spark.streaming.corpus import (
        merge_batch_neardup_into_corpus,
    )

    store = str(tmp_path / "corpus")
    b1 = spark.createDataFrame(
        [(i, _words(f"seed{i}", 30)) for i in range(4)],
        "doc_id long, text string",
    )
    assert merge_batch_neardup_into_corpus(
        b1, store, band_buckets=4, passage_min_run=16
    ) == 4

    ckpts, persists = [], []
    orig_ck, orig_p = DataFrame.localCheckpoint, DataFrame.persist

    def spy_ck(self, *a, **kw):
        ckpts.append(self)
        return orig_ck(self, *a, **kw)

    def spy_p(self, *a, **kw):
        persists.append(self)
        return orig_p(self, *a, **kw)

    monkeypatch.setattr(DataFrame, "localCheckpoint", spy_ck)
    monkeypatch.setattr(DataFrame, "persist", spy_p)
    b2 = spark.createDataFrame(
        [(10, _words("seed1", 30)),            # exact dup of store
         (11, _words("fresh11", 30))],         # new -> admitted
        "doc_id long, text string",
    )
    assert merge_batch_neardup_into_corpus(
        b2, store, band_buckets=4, passage_min_run=16
    ) == 1
    monkeypatch.undo()
    assert len(ckpts) == 4, [c.columns for c in ckpts]
    assert len(persists) == 10, [p.columns for p in persists]


@pytest.mark.slow
def test_semantic_stage_drops_embedding_neardups(spark, tmp_path):
    """Stage 4 (opt-in embedding_col): near-identical EMBEDDINGS are
    dropped even when their texts share nothing (stages 1-3 blind to
    them) — within-batch (smaller id wins) and vs the store's persisted
    _vectors_ivf index (store wins); replay appends nothing; the main
    store never grows an embedding column; every indexed vector sits in
    its frozen-centroid argmin cell."""
    from etl_weather_data_pipeline_spark.operators import ann_index as AX
    from etl_weather_data_pipeline_spark.operators.kmeans import (
        argmin_index,
    )
    from etl_weather_data_pipeline_spark.streaming.corpus import (
        VECTORS_IVF_SUBDIR,
        merge_batch_neardup_into_corpus,
    )
    from pyspark.sql import functions as F

    store = str(tmp_path / "corpus")
    vroot = f"{store}/{VECTORS_IVF_SUBDIR}"
    v0 = [float(x) for x in (5, -3, 2, -1, 4, -2, 1, 3)]
    v1 = [float(x) for x in (-4, 2, -5, 3, -1, 5, -2, -3)]
    v2 = [float(x) for x in (1, 5, -4, -2, 3, -5, 2, -1)]
    v11 = [float(x) for x in (-2, -4, 1, 5, -3, 2, 4, -5)]

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = (sum(x * x for x in a) * sum(y * y for y in b)) ** 0.5
        return num / den

    # precondition: the distinct vectors are nowhere near the threshold
    base = [v0, v1, v2, v11]
    assert all(
        cos(a, b) < 0.6
        for i, a in enumerate(base)
        for b in base[i + 1:]
    )

    def pert(v):  # cosine ~0.9997 to v — same perturbation SemDeDup uses
        return [x * (1.0 + 0.01 * ((i % 3) - 1)) for i, x in enumerate(v)]

    schema = "doc_id long, text string, embedding array<double>"

    def merge(rows):
        return merge_batch_neardup_into_corpus(
            spark.createDataFrame(rows, schema),
            store,
            embedding_col="embedding",
            semantic_cells=2,
            history=False,
        )

    # batch 1: three distinct docs + doc 3 whose TEXT is unique but
    # whose embedding near-duplicates doc 2 -> only 0,1,2 survive
    n1 = merge(
        [
            (0, "alpha bravo charlie delta echo", v0),
            (1, "foxtrot golf hotel india juliet", v1),
            (2, "kilo lima mike november oscar", v2),
            (3, "papa quebec romeo sierra tango", pert(v2)),
        ]
    )
    assert n1 == 3
    assert {r["doc_id"] for r in spark.read.parquet(store).collect()} == {
        0, 1, 2,
    }
    # vectors live ONLY in the index; the doc store has no embedding col
    assert "embedding" not in spark.read.parquet(store).columns
    assert AX.read_ivf_vectors(spark, vroot).count() == 3

    # batch 2: doc 10 semantically duplicates STORED doc 1 (new text);
    # doc 11 is genuinely new -> only 11 admitted
    batch2 = [
        (10, "uniform victor whiskey xray yankee", pert(v1)),
        (11, "zulu archer baker castle dancer", v11),
    ]
    assert merge(batch2) == 1
    assert {r["doc_id"] for r in spark.read.parquet(store).collect()} == {
        0, 1, 2, 11,
    }
    idx = AX.read_ivf_vectors(spark, vroot)
    assert {r["doc_id"] for r in idx.select("doc_id").collect()} == {
        0, 1, 2, 11,
    }
    # replay of batch 2: every doc dies at stage 1 (fingerprint probe),
    # nothing appends anywhere — store and index unchanged
    assert merge(batch2) == 0
    assert spark.read.parquet(store).count() == 4
    assert AX.read_ivf_vectors(spark, vroot).count() == 4
    # index store invariant: cell == argmin over the FROZEN centroids
    cents = AX.read_ivf_centroid_matrix(spark, vroot)
    bad = idx.filter(
        F.col("cell") != argmin_index(F.col("embedding"), cents).cast("int")
    ).count()
    assert bad == 0


@pytest.mark.slow
def test_ivf_index_compaction_and_coverage_audit(spark, tmp_path):
    """Operational closure of the stage-4 side index: (a) repeated
    incremental adds leave one file per touched cell per batch and
    compact_corpus_side_tables folds them per cell= partition WITHOUT
    changing probe results or the store invariant; (b) a batch merged
    with the semantic stage OFF creates exactly the documented coverage
    gap, audit_ivf_coverage names those ids, and re-feeding their
    embeddings through add_to_ivf_index closes it."""
    from etl_weather_data_pipeline_spark.operators import ann_index as AX
    from etl_weather_data_pipeline_spark.streaming.corpus import (
        VECTORS_IVF_SUBDIR,
        compact_corpus_side_tables,
        merge_batch_neardup_into_corpus,
    )
    from pyspark.sql import functions as F

    store = str(tmp_path / "corpus")
    vroot = f"{store}/{VECTORS_IVF_SUBDIR}"
    schema = "doc_id long, text string, embedding array<double>"

    def vec(seed):
        return [float(((seed * 37 + i * 11) % 13) - 6) for i in range(8)]

    def batch(ids, with_vec=True):
        rows = [
            (i, f"doc {i} " + " ".join(f"w{i}x{j}" for j in range(8)),
             vec(i))
            for i in ids
        ]
        if with_vec:
            return spark.createDataFrame(rows, schema)
        return spark.createDataFrame(
            [(i, t) for i, t, _ in rows], "doc_id long, text string"
        )

    # three vector-bearing merges -> >=2 files in the busiest cell
    merge = lambda df, **kw: merge_batch_neardup_into_corpus(
        df, store, semantic_cells=2, history=False, band_buckets=8, **kw
    )
    merge(batch([0, 1, 2, 3]), embedding_col="embedding")
    merge(batch([10, 11]), embedding_col="embedding")
    merge(batch([20, 21]), embedding_col="embedding")
    files_before = AX.all_partition_files(vroot)
    idx_before = sorted(
        tuple(r)
        for r in AX.read_ivf_vectors(spark, vroot)
        .select("doc_id", "cell")
        .collect()
    )
    qv = vec(0)
    top_before = [
        tuple(r)
        for r in AX.ivf_index_topk(spark, vroot, qv, k=5, n_probe=2)
        .collect()
    ]
    report = compact_corpus_side_tables(spark, store, band_buckets=8)
    assert report["vectors_ivf"]["files_after"] < len(files_before)
    idx_after = sorted(
        tuple(r)
        for r in AX.read_ivf_vectors(spark, vroot)
        .select("doc_id", "cell")
        .collect()
    )
    assert idx_after == idx_before  # compaction moved no row across cells
    top_after = [
        tuple(r)
        for r in AX.ivf_index_topk(spark, vroot, qv, k=5, n_probe=2)
        .collect()
    ]
    assert top_after == top_before

    # a semantic-off merge opens the documented gap; the audit names it
    merge(batch([30, 31], with_vec=False))
    store_ids = spark.read.parquet(store).select("doc_id")
    missing = AX.audit_ivf_coverage(spark, store_ids, vroot, "doc_id")
    assert {r["doc_id"] for r in missing.collect()} == {30, 31}
    # re-feeding embeddings for exactly those ids closes it
    AX.add_to_ivf_index(
        batch([30, 31]).select("doc_id", "embedding"), vroot
    )
    assert AX.audit_ivf_coverage(
        spark, store_ids, vroot, "doc_id"
    ).isEmpty()


def test_semantic_stage_lenient_on_bad_vectors(spark, tmp_path):
    """r10 advice: a row whose embedding is null / mis-sized / contains
    a null element must NOT wedge the merge via assign_cells' in-plan
    raise (inside foreachBatch the checkpoint would retry the batch
    forever) — it is admitted unjudged (fail-open), kept OUT of the
    index, and audit_ivf_coverage names it; valid rows in the same
    batch are still judged against the store."""
    from etl_weather_data_pipeline_spark.operators import ann_index as AX
    from etl_weather_data_pipeline_spark.streaming.corpus import (
        VECTORS_IVF_SUBDIR,
        merge_batch_neardup_into_corpus,
    )

    store = str(tmp_path / "corpus")
    vroot = f"{store}/{VECTORS_IVF_SUBDIR}"
    schema = "doc_id long, text string, embedding array<double>"
    v0 = [5.0, -3.0, 2.0, -1.0]
    v1 = [-4.0, 2.0, -5.0, 3.0]
    v2 = [1.0, 5.0, -4.0, -2.0]

    def merge(rows):
        return merge_batch_neardup_into_corpus(
            spark.createDataFrame(rows, schema),
            store,
            embedding_col="embedding",
            semantic_cells=2,
            history=False,
            band_buckets=4,
        )

    assert merge(
        [
            (0, "alpha bravo charlie delta", v0),
            (1, "echo foxtrot golf hotel", v1),
        ]
    ) == 2
    pert = [x * 1.001 for x in v1]  # cosine ~1.0 to stored doc 1
    n = merge(
        [
            (10, "india juliet kilo lima", None),
            (11, "mike november oscar papa", [1.0, None, 2.0, 3.0]),
            (12, "quebec romeo sierra tango", [1.0, 2.0]),
            (13, "uniform victor whiskey xray", pert),
            (14, "yankee zulu archer baker", v2),
        ]
    )
    # 13 drops (semantic dup of stored 1); the three bad-vector rows and
    # the genuinely-new 14 are admitted
    assert n == 4
    assert {r["doc_id"] for r in spark.read.parquet(store).collect()} == {
        0, 1, 2, 10, 11, 12, 14,
    } - {2}
    # bad-vector rows are the documented fail-open gap: in the corpus,
    # absent from the index, named by the audit
    store_ids = spark.read.parquet(store).select("doc_id")
    missing = AX.audit_ivf_coverage(spark, store_ids, vroot, "doc_id")
    assert {r["doc_id"] for r in missing.collect()} == {10, 11, 12}
    # the valid admitted row IS indexed (future batches judge against it)
    assert {
        r["doc_id"]
        for r in AX.read_ivf_vectors(spark, vroot)
        .select("doc_id")
        .collect()
    } == {0, 1, 14}


def test_semantic_stage_cell_population_stop_bound(spark, tmp_path):
    """r10 advice + the r8 self-join rule: a batch whose embeddings
    collapse into one cell must not go O(B^2) cosine pairs — rows in
    cells whose batch population exceeds semantic_max_cell_df skip
    stage 4 on BOTH joins (admitted fail-open, warnings.warn names the
    volume), while rows in under-bound cells are still judged."""
    import warnings as _warnings

    from etl_weather_data_pipeline_spark.operators import ann_index as AX
    from etl_weather_data_pipeline_spark.streaming.corpus import (
        VECTORS_IVF_SUBDIR,
        merge_batch_neardup_into_corpus,
    )

    store = str(tmp_path / "corpus")
    vroot = f"{store}/{VECTORS_IVF_SUBDIR}"
    schema = "doc_id long, text string, embedding array<double>"
    v0 = [5.0, -3.0, 2.0, -1.0]
    v1 = [-4.0, 2.0, -5.0, 3.0]

    def merge(rows, max_cell_df):
        return merge_batch_neardup_into_corpus(
            spark.createDataFrame(rows, schema),
            store,
            embedding_col="embedding",
            semantic_cells=2,
            semantic_max_cell_df=max_cell_df,
            history=False,
            band_buckets=4,
        )

    assert merge(
        [
            (0, "alpha bravo charlie delta", v0),
            (1, "echo foxtrot golf hotel", v1),
        ],
        max_cell_df=1000,
    ) == 2

    def pert(v, i):
        return [x * (1.0 + 0.0005 * (i + 1)) for x in v]

    words = [
        "india juliet kilo", "lima mike november", "oscar papa quebec",
        "romeo sierra tango", "uniform victor whiskey",
    ]
    # five near-identical copies of stored v0 (one cell, population 5
    # > bound 3) -> ALL admitted fail-open with a warning; one copy of
    # stored v1 (population 1 <= bound) -> still judged, dropped
    rows = [(10 + i, words[i], pert(v0, i)) for i in range(5)]
    rows.append((20, "xray yankee zulu", pert(v1, 0)))
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        n = merge(rows, max_cell_df=3)
    assert n == 5
    msgs = [str(x.message) for x in w]
    assert any("admitted unjudged" in m and "max_cell_df=3" in m
               for m in msgs), msgs
    got = {r["doc_id"] for r in spark.read.parquet(store).collect()}
    assert got == {0, 1, 10, 11, 12, 13, 14}
    # skipped rows' vectors still append to the index (valid vectors;
    # future batches CAN judge against them)
    assert {
        r["doc_id"]
        for r in AX.read_ivf_vectors(spark, vroot)
        .select("doc_id")
        .collect()
    } == {0, 1, 10, 11, 12, 13, 14}


@pytest.mark.slow
def test_semdedup_global_pass_closes_perbatch_gap(spark, tmp_path):
    """r10 verdict directive #5 — the gap -> audit -> re-judge round
    trip, live: per-batch stage 4 judges only against cells FROZEN at
    bootstrap, so a near-dup pair (cosine ~1.0) whose members land in
    DIFFERENT frozen cells is admitted blind; the periodic
    corpus-global pass (retrain_ivf_index + semdedup_global_audit's
    multi-probe blocking) then names exactly the missed pair as the
    re-judge work-list."""
    from pyspark.sql import functions as F

    from etl_weather_data_pipeline_spark.operators import ann_index as AX
    from etl_weather_data_pipeline_spark.operators.kmeans import (
        argmin_index,
    )
    from etl_weather_data_pipeline_spark.streaming.corpus import (
        VECTORS_IVF_SUBDIR,
        merge_batch_neardup_into_corpus,
    )

    store = str(tmp_path / "corpus")
    vroot = f"{store}/{VECTORS_IVF_SUBDIR}"
    schema = "doc_id long, text string, embedding array<double>"
    v0 = [10.0, 0.0, 0.0, 0.0]
    v1 = [0.0, 10.0, 0.0, 0.0]
    # a and b straddle the frozen cell boundary (a -> cell of v0,
    # b -> cell of v1) while cosine(a, b) ~ 0.9996 >= 0.95
    a = [5.1, 4.9, 0.0, 0.0]
    b = [4.9, 5.1, 0.0, 0.0]

    def merge(rows):
        return merge_batch_neardup_into_corpus(
            spark.createDataFrame(rows, schema), store,
            embedding_col="embedding", semantic_cells=2, history=False,
            band_buckets=4,
        )

    assert merge(
        [
            (0, "alpha bravo charlie delta", v0),
            (1, "echo foxtrot golf hotel", v1),
        ]
    ) == 2  # bootstrap: cells freeze at ~v0 / ~v1
    assert merge([(10, "india juliet kilo lima", a)]) == 1
    # b lands in the OTHER frozen cell: the per-batch probe never
    # compares it to doc 10 -> admitted blind (the documented gap)
    assert merge([(20, "mike november oscar papa", b)]) == 1
    assert {r["doc_id"] for r in spark.read.parquet(store).collect()} == {
        0, 1, 10, 20,
    }
    # the periodic global pass: retrain on the full store, multi-probe
    # re-judge -> exactly the missed pair, nothing else
    rep = AX.retrain_ivf_index(spark, vroot, iterations=2)
    assert rep["n_vectors"] == 4
    pairs = AX.semdedup_global_audit(
        spark, vroot, threshold=0.95, n_probe=2
    )
    assert {(r["id_a"], r["id_b"]) for r in pairs.collect()} == {(10, 20)}
    # post-swap store invariant holds (the re-judge ran on a consistent
    # index); the drop-list convention names the larger id
    cents = AX.read_ivf_centroid_matrix(spark, vroot)
    bad = (
        AX.read_ivf_vectors(spark, vroot)
        .filter(
            ~F.col("cell").eqNullSafe(
                argmin_index(F.col("embedding"), cents).cast("int")
            )
        )
        .count()
    )
    assert bad == 0


def test_semantic_bootstrap_trains_on_dominant_dim(spark, tmp_path):
    """r11 review: the bootstrap quantizer seeds from the k LOWEST ids,
    so a mis-sized vector holding the lowest id must not freeze a wrong
    quantizer dimension into the store (which would silently disable
    the stage for every correctly-sized vector forever) — training
    filters to the batch's DOMINANT dimension first."""
    from etl_weather_data_pipeline_spark.operators import ann_index as AX
    from etl_weather_data_pipeline_spark.streaming.corpus import (
        VECTORS_IVF_SUBDIR,
        merge_batch_neardup_into_corpus,
    )

    store = str(tmp_path / "corpus")
    vroot = f"{store}/{VECTORS_IVF_SUBDIR}"
    schema = "doc_id long, text string, embedding array<double>"
    v0 = [5.0, -3.0, 2.0, -1.0]
    v1 = [-4.0, 2.0, -5.0, 3.0]

    def merge(rows):
        return merge_batch_neardup_into_corpus(
            spark.createDataFrame(rows, schema), store,
            embedding_col="embedding", semantic_cells=2, history=False,
            band_buckets=4,
        )

    # the LOWEST id carries a dim-2 vector; dim 4 dominates the batch
    assert merge(
        [
            (0, "alpha bravo charlie delta", [1.0, 2.0]),
            (1, "echo foxtrot golf hotel", v0),
            (2, "india juliet kilo lima", v1),
        ]
    ) == 3
    # the frozen quantizer is dim 4; doc 0 is the fail-open gap
    assert AX.read_ivf_meta(vroot)["dim"] == 4
    store_ids = spark.read.parquet(store).select("doc_id")
    missing = AX.audit_ivf_coverage(spark, store_ids, vroot, "doc_id")
    assert {r["doc_id"] for r in missing.collect()} == {0}
    # the stage is ALIVE: a semantic dup of stored doc 1 is dropped
    pert = [x * 1.001 for x in v0]
    assert merge([(10, "mike november oscar papa", pert)]) == 0


def test_semantic_bootstrap_dim_tie_breaks_larger(spark, tmp_path):
    """r11 advice: a first batch evenly split between truncated/garbage
    SHORT vectors and real embeddings must freeze the REAL (larger)
    dimension — real model embeddings are never shorter than their
    truncations — and the dimension-mixed bootstrap must warn loudly so
    the frozen choice is visible."""
    import warnings

    from etl_weather_data_pipeline_spark.operators import ann_index as AX
    from etl_weather_data_pipeline_spark.streaming.corpus import (
        VECTORS_IVF_SUBDIR,
        merge_batch_neardup_into_corpus,
    )

    store = str(tmp_path / "corpus")
    vroot = f"{store}/{VECTORS_IVF_SUBDIR}"
    schema = "doc_id long, text string, embedding array<double>"
    rows = [
        (0, "alpha bravo charlie delta", [1.0, 2.0]),      # truncated
        (1, "echo foxtrot golf hotel", [9.0, 8.0]),        # truncated
        (2, "india juliet kilo lima", [5.0, -3.0, 2.0, -1.0]),
        (3, "mike november oscar papa", [-4.0, 2.0, -5.0, 3.0]),
    ]
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        n = merge_batch_neardup_into_corpus(
            spark.createDataFrame(rows, schema), store,
            embedding_col="embedding", semantic_cells=2, history=False,
            band_buckets=4,
        )
    assert n == 4
    # 2-vs-2 population tie: the LARGER dim is frozen into the store
    assert AX.read_ivf_meta(vroot)["dim"] == 4
    assert any(
        "dimension-mixed" in str(x.message) for x in w
    ), [str(x.message) for x in w]
    # the short vectors are the documented fail-open set, visibly
    store_ids = spark.read.parquet(store).select("doc_id")
    missing = AX.audit_ivf_coverage(spark, store_ids, vroot, "doc_id")
    assert {r["doc_id"] for r in missing.collect()} == {0, 1}


@pytest.mark.slow
def test_judge_batch_against_store_attaches_artifacts(spark, tmp_path):
    from tests.conftest import SF_SMOKE
    from pyspark.sql import functions as F

    """r11 verdict directive #4 — the attach path: a READ-ONLY batch
    funnel over a populated store must (a) derive every store-side
    signature/fingerprint from the persisted _bands/_winnow tables —
    minhash_signatures runs ONCE (batch only) and rolling_hashes runs
    twice (batch + candidate-pruned store texts, never the whole
    store); (b) write nothing; (c) admit EXACTLY the docs the merge
    sink subsequently admits (the judge and the sink share stage
    code, so a drift here is a bug by construction)."""
    import glob

    from etl_weather_data_pipeline_spark.operators import dedup as D
    from etl_weather_data_pipeline_spark.operators import passages as P
    from etl_weather_data_pipeline_spark.plans.catalog import load
    from etl_weather_data_pipeline_spark.streaming import corpus as C

    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    store = str(tmp_path / "corpus")
    assert C.merge_batch_neardup_into_corpus(
        docs.filter(F.col("doc_id") % 3 == 0), store,
        history=False, band_buckets=8, passage_min_run=16,
    ) > 0
    n_store = spark.read.parquet(store).count()

    def side_files():
        return sorted(
            glob.glob(f"{store}/_bands/**/*", recursive=True)
            + glob.glob(f"{store}/_winnow/**/*", recursive=True)
        )

    before_files = side_files()
    calls = {"sig": [], "rh": []}
    real_sig, real_rh = D.minhash_signatures, P.rolling_hashes

    def counting_sig(df, *a, **kw):
        calls["sig"].append(df.count())
        return real_sig(df, *a, **kw)

    def counting_rh(df, *a, **kw):
        calls["rh"].append(df.count())
        return real_rh(df, *a, **kw)

    D.minhash_signatures, P.rolling_hashes = counting_sig, counting_rh
    try:
        rep = C.judge_batch_against_store(
            docs, store, band_buckets=8, passage_min_run=16
        )
    finally:
        D.minhash_signatures, P.rolling_hashes = real_sig, real_rh
    assert rep["n_batch"] == docs.count()
    # exact stage dropped every doc already in the store
    assert rep["n_after_exact"] <= rep["n_batch"] - n_store
    assert (
        rep["n_survivors"]
        <= rep["n_after_neardup"]
        <= rep["n_after_exact"]
    )
    # (a) no store-wide re-hash: ONE signature pass (batch survivors
    # only — a second call would be the store rebuild), and the only
    # store text rolling_hashes ever saw is the candidate-pruned fetch
    assert len(calls["sig"]) == 1 and calls["sig"][0] == rep[
        "n_after_exact"
    ], calls
    assert len(calls["rh"]) == 2, calls
    assert calls["rh"][0] == rep["n_after_neardup"]
    assert calls["rh"][1] < n_store, calls  # candidate-pruned, not store
    # (b) read-only: side tables byte-identical, store row count flat
    assert side_files() == before_files
    assert spark.read.parquet(store).count() == n_store
    # (c) the judge predicts the merge sink exactly: same batch through
    # the sink admits exactly the judge's survivor ids
    judged = {r["doc_id"] for r in rep["survivors"].select("doc_id").collect()}
    ids_before = {r["doc_id"] for r in spark.read.parquet(store).collect()}
    n_merged = C.merge_batch_neardup_into_corpus(
        docs, store, history=False, band_buckets=8, passage_min_run=16
    )
    ids_after = {r["doc_id"] for r in spark.read.parquet(store).collect()}
    assert n_merged == rep["n_survivors"]
    assert ids_after - ids_before == judged


def test_judge_batch_requires_side_tables(spark, tmp_path):
    from tests.conftest import SF_SMOKE
    from pyspark.sql import functions as F

    """The read-only judge must never rebuild a missing side table
    (that IS the store-wide raw-text pass the attach avoids): a store
    built by the exact-only sink raises with the remediation named."""
    import pytest

    from etl_weather_data_pipeline_spark.plans.catalog import load
    from etl_weather_data_pipeline_spark.streaming import corpus as C

    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    store = str(tmp_path / "corpus")
    assert C.merge_batch_into_corpus(
        docs.filter(F.col("doc_id") % 3 == 0), store, history=False
    ) > 0
    with pytest.raises(RuntimeError, match="_bands"):
        C.judge_batch_against_store(docs, store, band_buckets=8)
    with pytest.raises(RuntimeError, match="no corpus store"):
        C.judge_batch_against_store(docs, str(tmp_path / "nope"))


@pytest.mark.slow
def test_streaming_merge_per_batch_probe_volumes(spark, tmp_path):
    """r11 verdict directive #3 (volume pin behind the measured
    amortization curve, COVERAGE.md r12): per-batch probe volumes must
    be bounded by the BATCH and the df stop bound, never by the store.
    Four equal quarter-batches merge into a growing store; before each
    merge the test recomputes the two store-probe volumes with the
    merge's own shapes and pins (a) band-candidate rows <= 2x batch
    docs (measured 0.1-0.2x at sf0.01), and (b) winnow
    fingerprint-match rows <= max_df * stop-bounded batch fingerprint
    rows — the cap that holds at ANY store size by construction
    (store-side fingerprints with df > max_df are dropped, so each
    batch fingerprint matches at most max_df store rows)."""
    from tests.conftest import SF_ORACLE

    from pyspark.sql import functions as F

    from etl_weather_data_pipeline_spark.operators.dedup import (
        minhash_band_table,
        minhash_signatures,
    )
    from etl_weather_data_pipeline_spark.operators.passages import (
        winnow_fingerprint_table,
    )
    from etl_weather_data_pipeline_spark.plans.catalog import load
    from etl_weather_data_pipeline_spark.streaming import corpus as C

    docs = load(spark, SF_ORACLE, "documents").select("doc_id", "text")
    store = str(tmp_path / "corpus")
    max_df = 50
    try:
        for i in range(4):
            batch = docs.filter(F.col("doc_id") % 4 == i)
            n_batch = batch.count()
            if i > 0:
                bands = spark.table(C.bands_table_name(store))
                bt = minhash_band_table(
                    minhash_signatures(
                        batch, "text", "doc_id", 8,
                        hash_family="xxhash64",
                    ),
                    "doc_id", 8, 4,
                )
                band_rows = (
                    bands.select(
                        F.col("doc_id").alias("id_a"),
                        "band_idx", "band_val",
                    )
                    .join(
                        bt.select(
                            F.col("doc_id").alias("id_b"),
                            "band_idx", "band_val",
                        ),
                        ["band_idx", "band_val"],
                    )
                    .count()
                )
                assert band_rows <= 2 * n_batch, (i, band_rows, n_batch)
                wt = spark.table(C.winnow_table_name(store))
                wfp = winnow_fingerprint_table(
                    batch, 8, 4, "doc_id", "text"
                )
                stop = (
                    wt.groupBy("fingerprint")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .filter(F.col("n") > max_df)
                    .select("fingerprint")
                )
                bfs = wfp.join(
                    F.broadcast(stop), "fingerprint", "left_anti"
                )
                n_bfp = bfs.count()
                match_rows = (
                    wt.join(F.broadcast(stop), "fingerprint", "left_anti")
                    .join(
                        bfs.withColumnRenamed("doc_id", "id_b"),
                        "fingerprint",
                    )
                    .count()
                )
                # the store-size-independent cap the stop bound grants
                assert match_rows <= max_df * n_bfp, (
                    i, match_rows, n_bfp,
                )
            assert C.merge_batch_neardup_into_corpus(
                batch, store, band_buckets=8, passage_min_run=16,
                history=False, winnow_max_df=max_df,
            ) > 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {C.bands_table_name(store)}")
        spark.sql(f"DROP TABLE IF EXISTS {C.winnow_table_name(store)}")


def test_judge_batch_semantic_stage_against_persisted_index(
    spark, tmp_path
):
    """Attach-path stage 4: the read-only judge assigns batch vectors
    to the store's FROZEN quantizer and drops semantic dups exactly as
    the sink would — and never bootstraps an index itself (a store
    without _vectors_ivf raises)."""
    import pytest

    from pyspark.sql import functions as F  # noqa: F401

    from etl_weather_data_pipeline_spark.streaming.corpus import (
        judge_batch_against_store,
        merge_batch_neardup_into_corpus,
    )

    store = str(tmp_path / "corpus")
    schema = "doc_id long, text string, embedding array<double>"
    v0 = [5.0, -3.0, 2.0, -1.0]
    v1 = [-4.0, 2.0, -5.0, 3.0]
    assert merge_batch_neardup_into_corpus(
        spark.createDataFrame(
            [
                (0, "alpha bravo charlie delta", v0),
                (1, "echo foxtrot golf hotel", v1),
            ],
            schema,
        ),
        store, embedding_col="embedding", semantic_cells=2,
        history=False, band_buckets=4,
    ) == 2
    # batch: one semantic dup of doc 0 (cosine ~1), one fresh direction
    pert = [x * 1.001 for x in v0]
    ortho = [1.0, 1.0, 1.0, 1.0]
    batch = spark.createDataFrame(
        [
            (10, "india juliet kilo lima", pert),
            (11, "mike november oscar papa", ortho),
        ],
        schema,
    )
    rep = judge_batch_against_store(
        batch, store, band_buckets=4, embedding_col="embedding"
    )
    kept = {r["doc_id"] for r in rep["survivors"].select("doc_id").collect()}
    assert kept == {11}, kept
    assert rep["n_survivors"] == 1 and rep["n_after_neardup"] == 2
    # the sink agrees (judge == merge), and the judge wrote nothing:
    # doc 10 is still judged (and dropped) on the second pass too
    n = merge_batch_neardup_into_corpus(
        batch, store, embedding_col="embedding", semantic_cells=2,
        history=False, band_buckets=4,
    )
    assert n == 1
    assert {
        r["doc_id"] for r in spark.read.parquet(store).collect()
    } == {0, 1, 11}
    # a store with no vector index: the read-only judge must refuse
    store2 = str(tmp_path / "corpus2")
    assert merge_batch_neardup_into_corpus(
        spark.createDataFrame(
            [(0, "alpha bravo charlie delta", v0)], schema
        ),
        store2, history=False, band_buckets=4,
    ) == 1
    with pytest.raises(RuntimeError, match="_vectors_ivf"):
        judge_batch_against_store(
            batch, store2, band_buckets=4, embedding_col="embedding"
        )


def test_merge_semantic_bootstrap_centroids_freeze_offline_quantizer(
    spark, tmp_path
):
    """semantic_bootstrap_centroids (r13): a caller-supplied
    OFFLINE-trained matrix freezes into the store's _vectors_ivf index
    bit-for-bit instead of the first batch training its own quantizer —
    the production shape where one representative-sample Lloyd run is
    shared across stores (routed from the session centroid memo by the
    corpus_attach_judge_semantic query). Semantic admissions judge
    against the SUPPLIED cells, and an existing index always wins over
    the parameter (frozen means frozen)."""
    from etl_weather_data_pipeline_spark.operators import ann_index as AX
    from etl_weather_data_pipeline_spark.streaming.corpus import (
        VECTORS_IVF_SUBDIR,
        merge_batch_neardup_into_corpus,
    )

    store = str(tmp_path / "corpus")
    schema = "doc_id long, text string, embedding array<double>"
    cents = [[4.0, -2.0, 1.5, -0.5], [-3.0, 1.0, -4.0, 2.5]]
    v0 = [5.0, -3.0, 2.0, -1.0]  # cell 0 under cents
    assert merge_batch_neardup_into_corpus(
        spark.createDataFrame(
            [(0, "alpha bravo charlie delta", v0)], schema
        ),
        store, embedding_col="embedding", history=False, band_buckets=4,
        semantic_bootstrap_centroids=cents,
    ) == 1
    vroot = f"{store}/{VECTORS_IVF_SUBDIR}"
    assert AX.read_ivf_centroid_matrix(spark, vroot) == cents
    # a later batch: semantic dup of doc 0 drops against the supplied
    # cells; a DIFFERENT centroid arg is ignored (index already frozen)
    pert = [x * 1.001 for x in v0]
    n = merge_batch_neardup_into_corpus(
        spark.createDataFrame(
            [
                (10, "india juliet kilo lima", pert),
                (11, "mike november oscar papa", [1.0, 1.0, 1.0, 1.0]),
            ],
            schema,
        ),
        store, embedding_col="embedding", history=False, band_buckets=4,
        semantic_bootstrap_centroids=[[9.9, 9.9, 9.9, 9.9]] * 2,
    )
    assert n == 1
    assert AX.read_ivf_centroid_matrix(spark, vroot) == cents
    assert {
        r["doc_id"] for r in spark.read.parquet(store).collect()
    } == {0, 11}


def test_compaction_folds_concurrent_side_appends(spark, tmp_path, monkeypatch):
    """r14 (the r11 retrain lost-update guard, applied to the side-table
    compaction): band/winnow rows a concurrent merge appends while the
    bucketed rewrite is staging used to be destroyed by the swap's
    rmtree of the old dir — a silent recall hole. The rewrite now diffs
    the live listing against the caller's pre-scan snapshot just before
    the swap and folds late files back in (with a loud warning). The
    race is injected deterministically: an append lands after
    compact_corpus_side_tables' snapshot but before the staged scan."""
    import warnings

    from pyspark.sql import functions as F

    from etl_weather_data_pipeline_spark.plans.catalog import load
    from etl_weather_data_pipeline_spark.streaming import corpus as C
    from tests.conftest import SF_SMOKE

    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    store = str(tmp_path / "store")
    C.merge_batch_neardup_into_corpus(
        docs.filter(F.col("doc_id") % 3 == 0), store,
        band_buckets=8, passage_min_run=16,
    )
    bands_name = C.bands_table_name(store)

    def rows_multiset(name):
        out = {}
        for r in spark.table(name).collect():
            k = tuple(r)
            out[k] = out.get(k, 0) + 1
        return out

    racing = spark.createDataFrame(
        [(1000001, 0, "zz_rc_1"), (1000002, 3, "zz_rc_2")],
        "doc_id bigint, band_idx int, band_val string",
    )
    original = rows_multiset(bands_name)
    racing_keys = {tuple(r) for r in racing.collect()}

    real = C._rewrite_side_bucketed

    def racy(spark_, rows, name, loc, spec, n_buckets, live_snapshot=None):
        if name == bands_name:
            # the concurrent merge's append: after the caller's
            # snapshot, before (or during) the staged scan
            C._append_side_bucketed(racing, name, loc, spec, n_buckets)
        return real(
            spark_, rows, name, loc, spec, n_buckets,
            live_snapshot=live_snapshot,
        )

    monkeypatch.setattr(C, "_rewrite_side_bucketed", racy)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        C.compact_corpus_side_tables(spark, store, band_buckets=8)
    monkeypatch.undo()
    assert any("folded back" in str(x.message) for x in w), [
        str(x.message) for x in w
    ]
    # NOTHING LOST — the guard's contract. Pre-guard, the racing rows
    # were destroyed by the swap's rmtree (count 0). Original rows pass
    # through the compaction exactly once; the racing rows survive with
    # count 1 (pure-late fold) or 2 (the documented admission-safe
    # duplicate when the staged scan's relation re-resolution also
    # caught them — what this Spark build does) — never 0.
    after = rows_multiset(bands_name)
    for k, v in original.items():
        assert after.get(k) == v, (k, v, after.get(k))
    for k in racing_keys:
        assert 1 <= after.get(k, 0) <= 2, (k, after.get(k))
    assert set(after) == set(original) | racing_keys
    spark.sql(f"DROP TABLE IF EXISTS {bands_name}")
    spark.sql(f"DROP TABLE IF EXISTS {C.winnow_table_name(store)}")


def test_side_table_self_recovers_midswap_crash(spark, tmp_path):
    """r14 auto-recovery at the side-table open point: a bucketed
    rewrite that died between its swap's two renames leaves the _bands
    dir missing with the complete rewritten copy at `.__staged__`; the
    next _ensure_side_table (i.e. the next merge or attach) must
    promote it and re-attach the catalog table, probes working."""
    import glob
    import os
    import shutil
    import warnings

    from pyspark.sql import functions as F

    from etl_weather_data_pipeline_spark.plans.catalog import load
    from etl_weather_data_pipeline_spark.streaming import corpus as C
    from tests.conftest import SF_SMOKE

    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    store = str(tmp_path / "store")
    C.merge_batch_neardup_into_corpus(
        docs.filter(F.col("doc_id") % 3 == 0), store, band_buckets=8
    )
    bands_name = C.bands_table_name(store)
    loc = f"{store}/{C.BANDS_SUBDIR}"
    n_rows = spark.table(bands_name).count()
    # simulate a NEW SESSION (the catalog entry dies with the crashed
    # driver) + the mid-swap disk state
    spark.sql(f"DROP TABLE IF EXISTS {bands_name}")
    shutil.copytree(loc, loc + ".__staged__")
    os.rename(loc, loc + ".old-fab00000")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        name = C._ensure_side_table(spark, store, C._BANDS_SPEC, 8)
    assert name == bands_name
    assert any("recovered prior crash state" in str(x.message) for x in w)
    assert spark.table(bands_name).count() == n_rows
    assert glob.glob(loc + ".old-*") == []
    assert glob.glob(loc + ".__staged__*") == []
    # the recovered table still serves a merge (probe plans intact)
    n = C.merge_batch_neardup_into_corpus(
        docs.filter(F.col("doc_id") % 3 == 1), store, band_buckets=8
    )
    assert n > 0
    spark.sql(f"DROP TABLE IF EXISTS {bands_name}")
    spark.sql(f"DROP TABLE IF EXISTS {C.winnow_table_name(store)}")


def test_streaming_transform_drops_critical_null_rows(spark, tmp_path):
    """P2 parity in the streaming path: a record missing a critical field
    (humidity here) must be dropped exactly as the batch transform drops
    it — not land in the warehouse with null buckets/comfort index."""
    base = dt.datetime(2023, 11, 7, 12, 0, 0)
    good = dict(
        city="London", country="GB", timestamp=base.isoformat(),
        temperature=15.0, feels_like=14.0, humidity=60, pressure=1013,
        description="ok", wind_speed=3.0, wind_direction=180,
        cloudiness=40, visibility=10.0, lat=51.5, lon=-0.12,
    )
    bad = dict(good, city="Tokyo", humidity=None)
    d = tmp_path / "landing"
    d.mkdir()
    (d / "b1.json").write_text("\n".join(json.dumps(r) for r in (good, bad)))
    out = transform_stream(stream_raw(spark, str(d)))
    _run_to_memory(out, "stream_critnull")
    rows = spark.sql("SELECT city FROM stream_critnull").collect()
    assert [r["city"] for r in rows] == ["London"]


def test_merge_sink_drops_null_keyed_poison_rows(spark, tmp_path):
    """A NULL-keyed record must not wedge the checkpointed merge sink:
    merge_upsert rejects NULL merge keys loudly (batch contract), and a
    failing micro-batch replays identically forever — the sink drops
    such rows instead (the streaming mirror of parse_api_payload's
    identity-field drop)."""
    base = dt.datetime(2023, 11, 7, 12, 0, 0)
    good = dict(
        city="London", country="GB", timestamp=base.isoformat(),
        temperature=15.0, feels_like=14.0, humidity=60, pressure=1013,
        description="ok", wind_speed=3.0, wind_direction=180,
        cloudiness=40, visibility=10.0, lat=51.5, lon=-0.12,
    )
    poison = dict(good, city=None, temperature=16.0)
    d = tmp_path / "landing"
    d.mkdir()
    (d / "b1.json").write_text("\n".join(json.dumps(r) for r in (good, poison)))
    wh = str(tmp_path / "wh")
    # city is NOT a critical field, so the poison row survives
    # transform_stream and reaches merge_batch itself
    q = start_merge_sink(
        transform_stream(stream_raw(spark, str(d))), wh, str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.read.parquet(f"{wh}/weather_data").collect()
    assert [r["city"] for r in rows] == ["London"]


def test_stateful_running_stats_ignores_nulls(spark, tmp_path):
    """NULL values count toward neither n nor the aggregates; an
    all-null key emits n=0 with NULL bounds instead of ±inf."""
    from etl_weather_data_pipeline_spark.streaming.state import (
        running_stats_per_key,
    )

    d = tmp_path / "landing"
    d.mkdir()
    rows = [
        {"k": "a", "v": 1.0}, {"k": "a", "v": None}, {"k": "a", "v": 3.0},
        {"k": "allnull", "v": None}, {"k": "allnull", "v": None},
    ]
    (d / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    sdf = spark.readStream.schema("k string, v double").json(str(d))
    q = (
        running_stats_per_key(sdf, "k", "v")
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_nulls")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {r["key"]: r for r in spark.sql("SELECT * FROM stateful_nulls").collect()}
    a = rows["a"]
    assert (a["n"], a["total"], a["vmin"], a["vmax"]) == (2, 4.0, 1.0, 3.0)
    an = rows["allnull"]
    assert (an["n"], an["total"], an["vmin"], an["vmax"]) == (0, 0.0, None, None)


def test_stateful_running_stats_idle_eviction(spark, tmp_path):
    """idle_timeout_ms bounds state on unbounded key cardinality: a key
    idle past the timeout is EVICTED (its state dropped at a later
    micro-batch), so a later appearance restarts from zero.

    NOTE: with processing-time timeouts registered, the query schedules
    batches on its own to evaluate them, so processAllAvailable never
    quiesces — the test POLLS the memory sink with a deadline instead."""
    import time as _time

    from etl_weather_data_pipeline_spark.streaming.state import (
        running_stats_per_key,
    )

    def wait_for(predicate, deadline_s=60.0):
        t0 = _time.monotonic()
        while _time.monotonic() - t0 < deadline_s:
            if predicate():
                return
            _time.sleep(0.25)
        raise AssertionError("condition not reached before deadline")

    d = tmp_path / "landing"
    d.mkdir()
    (d / "b1.json").write_text(json.dumps({"k": "a", "v": 1.0}))
    sdf = spark.readStream.schema("k string, v double").json(str(d))
    q = (
        running_stats_per_key(sdf, "k", "v", idle_timeout_ms=2000)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_evict")
        .start()
    )

    def rows_for(key):
        return spark.sql(
            f"SELECT * FROM stateful_evict WHERE key = '{key}'"
        ).collect()

    try:
        wait_for(lambda: len(rows_for("a")) >= 1)
        _time.sleep(3.5)  # let a's 2 s idle timer expire
        # a's expired timer fires on a later batch -> state removed;
        # land another key's data to keep the stream visibly alive
        (d / "b2.json").write_text(json.dumps({"k": "other", "v": 7.0}))
        wait_for(lambda: len(rows_for("other")) >= 1)
        _time.sleep(1.0)
        # a reappears: state restarted, not continued
        (d / "b3.json").write_text(json.dumps({"k": "a", "v": 5.0}))
        wait_for(
            lambda: any(r["total"] == 5.0 for r in rows_for("a"))
        )
    finally:
        q.stop()
    a_rows = sorted(
        (r["n"], r["total"]) for r in rows_for("a")
    )
    assert a_rows == [(1, 1.0), (1, 5.0)]  # second appearance is fresh


def test_side_table_compaction_single_rewrite_on_marker_mismatch(
    spark, tmp_path, monkeypatch
):
    """A legacy / marker-mismatched side table is rewritten ONCE per
    maintenance pass: _ensure_side_table's attach rewrite already lands
    one file per non-empty bucket, so the compaction loop must not pay a
    second corpus-sized staged rewrite for the same table. files_before
    reports the true pre-maintenance count (globbed before the attach)."""
    import os

    from pyspark.sql import functions as F

    from etl_weather_data_pipeline_spark.streaming import corpus as C
    from tests.conftest import SF_SMOKE
    from etl_weather_data_pipeline_spark.plans.catalog import load

    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    store = str(tmp_path / "store")
    C.merge_batch_neardup_into_corpus(
        docs.filter(F.col("doc_id") % 5 == 0), store, band_buckets=8
    )
    bands_name = C.bands_table_name(store)
    loc = f"{store}/{C.BANDS_SUBDIR}"
    n_files_live = len(
        [f for f in os.listdir(loc) if f.endswith(".parquet")]
    )
    # simulate a NEW SESSION against a PRE-MARKER store: catalog entry
    # gone, marker gone -> the attach cannot prove the layout and must
    # take the rewrite path
    spark.sql(f"DROP TABLE IF EXISTS {bands_name}")
    os.remove(os.path.join(loc, C._BUCKET_MARKER))

    calls = []
    real = C._rewrite_side_bucketed

    def counting(spark_, rows, name, loc_, spec, n_buckets, **kw):
        calls.append(loc_)
        return real(spark_, rows, name, loc_, spec, n_buckets, **kw)

    monkeypatch.setattr(C, "_rewrite_side_bucketed", counting)
    rep = C.compact_corpus_side_tables(spark, store, band_buckets=8)
    assert [c for c in calls if c == loc] == [loc]  # exactly ONE rewrite
    assert rep["bands"]["files_before"] == n_files_live
    # table attached and serving
    assert spark.table(bands_name).count() > 0
    spark.sql(f"DROP TABLE IF EXISTS {bands_name}")
    spark.sql(f"DROP TABLE IF EXISTS {C.winnow_table_name(store)}")
