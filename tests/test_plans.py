"""Physical-plan shape assertions — the scale contract.

These tests pin the plan properties that matter at 100 TB: filters reach
the parquet scan, columns are pruned, small sides broadcast, blocked
self-joins stay equi-joins (no cartesian products), windowed operators
shuffle exactly once, and the hot path stays in whole-stage codegen.
A regression here is a performance bug even when results stay correct.
"""

from __future__ import annotations

import re

import pytest

from etl_weather_data_pipeline_spark.plans.catalog import build_registry

from tests.conftest import SF_SMOKE

REG = build_registry()


def plan_of(spark, name: str) -> str:
    df = REG[name].spark(spark, SF_SMOKE)
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def n_nodes(plan: str, op: str) -> int:
    """Count operator nodes in a formatted plan (details section lists each
    node once as '(N) <Op>'; the tree repeats them)."""
    return len(re.findall(rf"^\(\d+\) {op}", plan, re.M))


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_column_pruning(spark):
    # events has a props column the query never touches; the scan must not
    # read it.
    plan = plan_of(spark, "events_enriched")
    assert "props" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_partial_aggregation(spark):
    # partial + final hash aggregate (map-side combine before the shuffle)
    plan = plan_of(spark, "pricing_summary")
    assert plan.count("HashAggregate") >= 2


def analyzed_of(spark, name: str) -> str:
    df = REG[name].spark(spark, SF_SMOKE)
    return df._jdf.queryExecution().analyzed().toString()


def test_broadcast_joins_chosen(spark):
    # At this SF the planner should still pick broadcast for the small
    # sides from size stats alone — no hints needed.
    for name in ("top_revenue_orders", "segment_order_stats", "brand_part_stats"):
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_no_forced_broadcast_on_scaling_tables(spark):
    # Scale contract: a broadcast HINT on a table that grows with the data
    # overrides AQE's size check and is an OOM at 100x. Queries whose only
    # non-lineitem sides scale (orders, customer) must carry NO hint —
    # AQE chooses broadcast at runtime when the side is actually small.
    for name in ("top_revenue_orders", "segment_order_stats"):
        analyzed = analyzed_of(spark, name)
        assert "ResolvedHint" not in analyzed, name


def test_nation_revenue_all_dims_broadcast(spark):
    # Physical: everything still broadcasts at this SF; logical: exactly the
    # three bounded dims (supplier, nation, region) are hinted — never the
    # scaling orders/customer sides.
    plan = plan_of(spark, "nation_revenue")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan
    analyzed = analyzed_of(spark, "nation_revenue")
    assert analyzed.count("ResolvedHint") == 3


def test_blocked_selfjoins_are_equijoins(spark):
    # The pair-generating ops must never degenerate into cartesian products.
    for name in ("doc_jaccard_pairs", "doc_minhash_lsh_pairs",
                 "embedding_neardup_pairs", "doc_simhash_pairs",
                 "doc_ngram_jaccard_pairs"):
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_range_join_is_broadcast_nested_loop(spark):
    # ...while the genuine range join SHOULD be a broadcast nested loop
    # over the tiny band dim (the right plan for a non-equi predicate).
    plan = plan_of(spark, "events_range_join")
    assert "BroadcastNestedLoopJoin" in plan


def test_window_ops_single_shuffle(spark):
    for name in ("latest_event_per_user", "dedup_events_hourly"):
        plan = plan_of(spark, name)
        n_exchanges = n_nodes(plan, "Exchange")
        assert n_exchanges == 1, f"{name}: {n_exchanges} shuffles"
        # rank-filter pushdown: partial top-1 per partition before the
        # shuffle (WindowGroupLimit below AND above the exchange)
        assert n_nodes(plan, "WindowGroupLimit") == 2, name


def test_sessionize_shares_one_shuffle(spark):
    # lag + running-sum + groupBy on the same key: the window sort must be
    # reused; allow the final agg exchange but no extra window exchange.
    plan = plan_of(spark, "user_sessions")
    assert n_nodes(plan, "Exchange") <= 2
    assert n_nodes(plan, "Sort") <= 2


def test_whole_stage_codegen_on_hot_path(spark):
    # formatted mode marks codegen'd operators with a '*' prefix. Notes:
    # AQE-wrapped plans omit stars before execution (isFinalPlan=false), and
    # higher-order-function projections legitimately fall back — but the
    # scalar-expression battery and the vectorized parquet read must stay
    # in codegen.
    plan = plan_of(spark, "events_enriched")
    assert "* Project" in plan and "* ColumnarToRow" in plan
    plan = plan_of(spark, "doc_text_stats")
    assert "* ColumnarToRow" in plan  # vectorized scan; HOF project falls back


def test_topk_is_take_ordered(spark):
    # ORDER BY + LIMIT must compile to TakeOrderedAndProject (partial
    # top-k per partition), not a full sort.
    plan = plan_of(spark, "ann_cosine_topk")
    assert "TakeOrderedAndProject" in plan


def test_flagship_one_lazy_action(spark):
    # The flagship is ONE lazy action: the N2 median is an in-plan 1-row
    # aggregate branch broadcast back into the projection (scalar-subquery
    # shape) — building the DataFrame must NOT run an eager median job.
    # Catalyst column-prunes the median branch, so the plan carries exactly
    # two parquet scans (wide main + narrow median) and three exchanges
    # (dedup window shuffle per branch + the median's partial/final agg);
    # the 1-row median attaches via a broadcast nested-loop join, which is
    # O(rows) for a single-row build side. Persisting the deduped
    # intermediate instead would pin the full wide table at 100 TB — the
    # pruned re-read is the cheaper scale trade.
    plan = plan_of(spark, "weather_pipeline_e2e")
    assert n_nodes(plan, "Scan parquet") == 2
    assert n_nodes(plan, "Exchange") == 3
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 1


def test_winnow_is_maponly_without_inferred_filter(spark):
    # Winnowing fingerprints must stay a map-only projection chain +
    # Generate: zero shuffles, and NO inferred `size(...) > 0` pre-filter —
    # InferFiltersFromGenerate on a plain explode sinks one below every
    # projection, alias-substituting the whole nested HOF chain into a
    # per-row re-computation (measured >100x; the query uses explode_outer
    # + isNotNull on the generated attribute instead).
    plan = plan_of(spark, "doc_winnow_fingerprints")
    assert n_nodes(plan, "Exchange") == 0
    assert n_nodes(plan, "Generate") == 1
    df = REG["doc_winnow_fingerprints"].spark(spark, SF_SMOKE)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    # Filter NODES only: the artifact store's cached relation renders a
    # FileScan line whose "PartitionFilters:" detail would otherwise
    # false-match a substring grep (r11)
    filters = [
        ln
        for ln in optimized.splitlines()
        if re.match(r"^[\s+:\-]*Filter ", ln)
    ]
    assert len(filters) == 1 and "isnotnull" in filters[0]
    assert "size(" not in filters[0]


def test_curation_flagship_shape(spark):
    # The curation chain must stay equi-join only (LSH band join + verify
    # joins + anti-join), and the deduped intermediate must be a cached
    # reuse point (InMemoryRelation) so the corpus is scanned once, not
    # once per DAG branch.
    plan = plan_of(spark, "corpus_curation_pipeline")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "InMemoryRelation" in plan or "InMemoryTableScan" in plan


def test_jaccard_pushdown_barrier_holds(spark):
    # The intersect-count alias is wrapped in pin_once (+int(rand(0)*0)):
    # the nondeterministic PROJECTION is a pushdown barrier, so the
    # threshold filter can never be alias-substituted through it and
    # array_intersect evaluates exactly ONCE per candidate pair. (A
    # nondeterministic term on the filter alone is NOT enough — Spark
    # pushes nondeterministic filters through deterministic projects,
    # re-inlining the intersect 2x into the pushed predicate; observed on
    # 4.1, measured ~2x slower.) Pin: exactly one plan line computes
    # array_intersect (the projection, which also carries the rand
    # barrier), and no Filter/Join line contains it. Red if an optimizer
    # change folds rand*0 or collapses the projection.
    for name in ("doc_jaccard_pairs", "doc_ngram_jaccard_pairs"):
        df = REG[name].spark(spark, SF_SMOKE)
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        lines = opt.splitlines()
        inter = [ln for ln in lines if "array_intersect" in ln]
        assert len(inter) == 1, (
            f"{name}: intersect must appear exactly once\n{opt}"
        )
        assert "rand(" in inter[0] and "Project" in inter[0], (
            f"{name}: barrier not in the intersect projection\n{opt}"
        )
        for ln in lines:
            if "Filter" in ln or "Join" in ln:
                assert "array_intersect" not in ln, (
                    f"{name}: intersect re-computed inside a predicate\n{opt}"
                )


def test_median_by_type_one_lazy_action(spark):
    # The global median must be an in-plan 1-row aggregate attached via
    # broadcast nested-loop join (O(rows) for a 1-row build side), not an
    # eager .first() pre-pass that runs the events scan as a separate job
    # at DataFrame-build time.
    plan = plan_of(spark, "median_value_by_type")
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 1
    assert n_nodes(plan, "Scan parquet") == 2


def test_stratified_sample_uses_window_group_limit(spark):
    # Rank-filter sampling must plan as WindowGroupLimit: each partition
    # keeps only n rows per stratum BEFORE the shuffle, so the exchange
    # carries O(strata x n), not the corpus.
    plan = plan_of(spark, "doc_stratified_sample")
    assert "WindowGroupLimit" in plan


def test_round3_additions_plan_shapes(spark):
    # embedding_quantize_stats: the window norm and the final aggregate
    # must SHARE the vec_id exchange (one shuffle total) — a second
    # exchange means the groupBy re-shuffled what the window already
    # partitioned.
    p = plan_of(spark, "embedding_quantize_stats")
    assert n_nodes(p, "Exchange") == 1 and n_nodes(p, "Window") == 1
    # quantile gating: one window shuffle on source, nothing else
    p = plan_of(spark, "doc_quality_quantile_filter")
    assert n_nodes(p, "Exchange") == 1 and n_nodes(p, "Window") == 1
    # histogram: single partial+final hash aggregate
    p = plan_of(spark, "corpus_length_histogram")
    assert n_nodes(p, "Exchange") == 1 and p.count("HashAggregate") >= 2
    # span dedup: map-side chunking (one Generate), no cartesian anywhere,
    # and the count_distinct agg stays in hash aggregates
    p = plan_of(spark, "doc_span_dedup")
    assert n_nodes(p, "Generate") == 1
    assert "CartesianProduct" not in p and "SortAggregate" not in p
    # estimate + degree: pair generation must stay equi-join only
    for name in ("doc_minhash_jaccard_estimate", "neardup_degree_stats"):
        p = plan_of(spark, name)
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name


def test_round3_batch2_plan_shapes(spark):
    # chunking: map-only — the index sequence explodes (one Generate),
    # the slice happens AFTER the explode, and nothing shuffles
    p = plan_of(spark, "doc_chunk_spans")
    assert n_nodes(p, "Exchange") == 0 and n_nodes(p, "Generate") == 1
    # sequence packing: the (source, seq_id) aggregate must REUSE the
    # window's hash(source) partitioning — exactly one exchange
    p = plan_of(spark, "corpus_sequence_pack")
    assert n_nodes(p, "Exchange") == 1 and n_nodes(p, "Window") == 1
    # gopher rules: pure map-side codegen, no shuffle, no UDF
    p = plan_of(spark, "doc_gopher_quality_flags")
    assert n_nodes(p, "Exchange") == 0
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # temperature sample: rates join back as a BROADCAST onto the doc
    # scan — the fact side must never sort-merge or shuffle for the join
    p = plan_of(spark, "corpus_temperature_sample")
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
    # semdedup keep: blocked pair join stays equi-join; the keep filter is
    # a broadcast left-anti (losers are a shrinking minority of the table)
    p = plan_of(spark, "embedding_semdedup_keep")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_incremental_dedup_plan(spark):
    # batch self-dedup is a hash aggregate; the corpus probe is an
    # equi-anti-join on the fingerprint — no cartesian, no UDF, and the
    # corpus side reads ONLY the text column it fingerprints
    p = plan_of(spark, "doc_incremental_dedup")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert p.count("HashAggregate") >= 2


def test_unigram_logprob_explodes_once_per_consumer(spark):
    # token stream: one Generate for the vocab branch + one for the doc
    # scores — the corpus TOTAL must come from a narrow no-explode scan
    # (3 scans, only 2 Generates), not a third explode pass
    p = plan_of(spark, "doc_unigram_logprob")
    assert n_nodes(p, "Generate") == 2, p
    assert "BatchEvalPython" not in p and "CartesianProduct" not in p


def test_anomaly_zscore_stats_broadcast(spark):
    # per-type stats are a tiny aggregate broadcast onto the fact scan —
    # the events table must not sort-merge for the stats join
    p = plan_of(spark, "events_anomaly_zscore")
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p


def test_funnel_is_equijoin_only(spark):
    # the 24h window must stay a post-join predicate on user_id equi-joins
    p = plan_of(spark, "events_funnel_conversion")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_round4_additions_plan_shapes(spark):
    # winnow overlap: the stop-fingerprint filter + sizes are WINDOW
    # aggregates (no extra size-lookup joins) and the pair join is an
    # equi-join on the fingerprint — never a cartesian
    p = plan_of(spark, "doc_winnow_overlap_pairs")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert n_nodes(p, "Window") >= 2
    # r5: the sketch is persisted before the self-join — both sides read
    # the ONE cached relation, so the whole Rabin-Karp + winnow chain has
    # exactly one parquet scan and one Generate in the plan (r4 regression:
    # 4 scans / 4 Generates / 0 ReusedExchange = sketch evaluated twice)
    assert n_nodes(p, "InMemoryTableScan") >= 1, p
    assert n_nodes(p, "Scan parquet") == 1, p
    assert n_nodes(p, "Generate") == 1, p
    from etl_weather_data_pipeline_spark.plans.llmops import (
        release_curation_cache,
    )

    release_curation_cache()

    # source KL: the token stream is exploded/shuffled ONCE into
    # (source, token) counts; per-source totals and the grand total come
    # back as broadcasts, not sort-merge joins of the token stream
    p = plan_of(spark, "source_token_kl")
    assert n_nodes(p, "Generate") <= 2, p
    assert "BroadcastHashJoin" in p
    assert "BatchEvalPython" not in p

    # dim stats: single pass — one Generate, partial+final hash agg,
    # no second scan for the variance
    p = plan_of(spark, "embedding_dim_stats")
    assert n_nodes(p, "Generate") == 1
    assert p.count("HashAggregate") >= 2

    # novelty: first-occurrence is a window min on the shingle (one
    # exchange), NOT a groupBy + join-back (two)
    p = plan_of(spark, "doc_ngram_novelty")
    assert n_nodes(p, "Window") == 1
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_round5_additions_plan_shapes(spark):
    from etl_weather_data_pipeline_spark.plans.llmops import (
        release_curation_cache,
    )

    # DSIR: the vocab (unigram LM) table is persisted — the scoring join
    # and the vocab-size aggregate must read the ONE cached relation, and
    # the exploded token stream appears exactly twice (once inside the
    # cached vocab plan, once live for scoring); totals broadcast.
    p = plan_of(spark, "dsir_importance_weights")
    assert n_nodes(p, "InMemoryTableScan") >= 1, p
    assert n_nodes(p, "Generate") <= 2, p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p
    release_curation_cache()

    # cross-source matrix: LSH-bounded verified pairs + two equi-joins on
    # the narrow (doc_id, source) projection — never a cartesian
    p = plan_of(spark, "neardup_cross_source_matrix")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert p.count("HashAggregate") >= 2
    # the source-lookup side must scan ONLY (doc_id, source) — the text
    # column is read solely by the LSH/verify scans
    schemas = [seg.split("\n")[0] for seg in p.split("ReadSchema: ")[1:]]
    assert any("source" in s and "text" not in s for s in schemas), schemas

    # dedup funnel: the three survivor/gram intermediates are persisted
    # (each feeds 2+ branches), pair stages stay equi-joins, and the
    # plan never degenerates into a cartesian product
    p = plan_of(spark, "corpus_dedup_funnel")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert n_nodes(p, "InMemoryTableScan") >= 3, p
    release_curation_cache()

    # exact passage pairs: the (doc_id, pos, gram) table is persisted —
    # one parquet scan / one Generate for the whole Rabin-Karp chain,
    # both self-join sides on the cached relation; gaps-and-islands is
    # windows + hash aggregates, never a cartesian
    p = plan_of(spark, "doc_exact_passage_pairs")
    assert n_nodes(p, "InMemoryTableScan") >= 1, p
    assert n_nodes(p, "Scan parquet") == 1, p
    assert n_nodes(p, "Generate") == 1, p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert n_nodes(p, "Window") >= 2
    release_curation_cache()


def test_round6_additions_plan_shapes(spark):
    from etl_weather_data_pipeline_spark.plans.llmops import (
        release_curation_cache,
    )

    # blocked passage composition: ONE shared Rabin-Karp pass — the
    # rolling-hash arrays persist and BOTH derived tables (winnow sketch,
    # gram positions) read the cache, so no numbered parquet re-scan
    # appears in the outer plan and only the two derived-table Generates
    # (sketch explode, gram posexplode) remain; sketch + gram caches each
    # feed two join sides (6 InMemoryTableScans total); candidate routing
    # stays equi-join — never a cartesian
    p = plan_of(spark, "doc_passage_pairs_blocked")
    # (formatted explain numbers at most one scan — the one inside the
    # shared hash cache's plan; rendering of nested cached plans varies
    # with session config, so pin "no re-scan" as <= 1, plus the Generate
    # count which is what actually proves the chain ran once per table)
    assert n_nodes(p, "Scan parquet") <= 1, p
    assert n_nodes(p, "InMemoryTableScan") == 6, p
    assert n_nodes(p, "Generate") == 2, p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert n_nodes(p, "Window") >= 3
    release_curation_cache()

    # incremental funnel: store projection + exact-stage survivors are
    # persisted (each feeds multiple branches: union sides, verify sides,
    # stage counts); every pair stage stays an equi-join
    p = plan_of(spark, "corpus_dedup_funnel_incremental")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert n_nodes(p, "InMemoryTableScan") >= 4, p
    release_curation_cache()

    # recall probe: planting is map-side (Generate of the strength array,
    # no join to build copies), blocking stays the band equi-join, truth
    # is computed per planted row — never a quadratic truth pass
    p = plan_of(spark, "dedup_recall_probe")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p

    # blocked funnel: s1/s2 survivor sets + the shared hash arrays +
    # sketch + gram tables all persist (>= 6 InMemoryTableScans across
    # the reuse points); stage-3 candidate routing stays equi-join
    p = plan_of(spark, "corpus_dedup_funnel_blocked")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert n_nodes(p, "InMemoryTableScan") >= 6, p
    release_curation_cache()

    # intact packing: ONE hash exchange on the group key feeding the
    # single Arrow grouped-map node (text is tokenized at the scan and
    # projected away before the shuffle — the exchange carries id + tc)
    p = plan_of(spark, "corpus_pack_intact")
    assert n_nodes(p, "Exchange") == 1, p
    assert n_nodes(p, "FlatMapGroupsInPandas") == 1, p
    assert n_nodes(p, "Scan parquet") == 1, p


def test_merge_state_probe_is_anti_join(spark):
    # the merge sink's store probe must stay a left-anti equi-join on the
    # fingerprint projection (column-pruned store scan, no cartesian)
    from etl_weather_data_pipeline_spark.functions import text as TX
    from pyspark.sql import functions as F

    # plan-shape check on the operator itself, against an existing store
    import tempfile

    store = tempfile.mkdtemp(prefix="probe_pin_") + "/store"
    base = spark.range(3).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("seed "), F.col("id")).alias("text"),
        F.lit("en").alias("lang"),
    )
    from etl_weather_data_pipeline_spark.streaming.corpus import (
        merge_batch_into_corpus,
    )

    merge_batch_into_corpus(base, store, hash_family="md5")
    batch = base.withColumn(
        "fingerprint", TX.fingerprint(F.col("text"), "md5")
    )
    seen = spark.read.parquet(store).select("fingerprint")
    probe = batch.join(seen, "fingerprint", "left_anti")
    plan = spark._jvm.PythonSQLUtils.explainString(
        probe._jdf.queryExecution(), "formatted"
    )
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    rs = plan.split("ReadSchema")[-1].split("\n")[0]
    assert "text" not in rs, rs  # store scan pruned to the fingerprint


def test_round7_additions_plan_shapes(spark):
    from etl_weather_data_pipeline_spark.plans.llmops import (
        release_curation_cache,
    )

    # passage recall probe: ONE shared Rabin-Karp pass over the planted
    # corpus (hash cache + sketch + gram caches, each multi-consumer:
    # the gram cache feeds the blocked match's two sides AND the truth
    # match's two sides); planting is map-side (constant-array Generate
    # + reverse/substr projection, no join builds the copies); blocking,
    # blocked verify, and the known-pair truth verify are all equi-joins
    # — never a cartesian, never a quadratic truth pass, no Python
    p = plan_of(spark, "passage_recall_probe")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p
    assert n_nodes(p, "InMemoryTableScan") >= 4, p
    release_curation_cache()

    # pack-stats report: the narrow (doc_id, n_tokens) projection is
    # persisted ONCE and feeds both the Arrow packer and the join back
    # (two-branch re-evaluation trap) — one parquet scan inside the
    # cache, one grouped-map node, no extra tokenization pass
    p = plan_of(spark, "corpus_pack_stats")
    assert n_nodes(p, "Scan parquet") <= 1, p
    assert n_nodes(p, "InMemoryTableScan") == 2, p
    assert n_nodes(p, "FlatMapGroupsInPandas") == 1, p
    release_curation_cache()

    # MAD battery (r14 consolidation of the exact + approx rows): same
    # two-broadcast-pass shape (group stats broadcast back into the scan
    # twice), sketch and exact percentiles ride the same aggregates — no
    # extra shuffle beyond the three group-by passes, no cartesian
    p = plan_of(spark, "events_mad_outliers_battery")
    assert "CartesianProduct" not in p
    assert n_nodes(p, "BroadcastHashJoin") == 2, p
    assert "BatchEvalPython" not in p


def test_cdc_chunk_dedup_plan_shape(spark):
    # chunking is entirely map-side (one Generate over the per-doc chunk
    # arrays, layered projections — no join builds the chunks); the
    # (doc, fingerprint) pre-aggregate is persisted once and feeds both
    # the global occurrence count and the per-doc rollup; no cartesian,
    # no Python workers, no window (the occurrence count is a
    # partial-aggregating groupBy — skew-absorbing, unlike a window on
    # the same key)
    from etl_weather_data_pipeline_spark.plans.llmops import (
        release_curation_cache,
    )

    p = plan_of(spark, "doc_cdc_chunk_dedup")
    assert n_nodes(p, "Generate") <= 1, p
    assert n_nodes(p, "InMemoryTableScan") == 2, p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert n_nodes(p, "Window") == 0, p
    assert "BatchEvalPython" not in p

    # THE r7 scale fix: no raw text column (chunk, the normalized text,
    # or the source text) may cross ANY exchange — every shuffle payload
    # is fingerprints + counts only. Checked on the cached-plan
    # exchanges AND on the cache-BUILD plan (the pre-aggregate's own
    # shuffle — the formatted explain of the cached query hides it
    # behind InMemoryTableScan, so explain the shared builder directly).
    from etl_weather_data_pipeline_spark.plans.catalog import load
    from etl_weather_data_pipeline_spark.plans.llmops import (
        _cdc_per_doc_fp,
    )

    per = _cdc_per_doc_fp(load(spark, SF_SMOKE, "documents"))
    build = spark._jvm.PythonSQLUtils.explainString(
        per._jdf.queryExecution(), "formatted"
    )
    assert n_nodes(build, "Exchange") >= 1, build
    for plan_text in (p, build):
        for block in re.split(r"\n\n", plan_text):
            if re.match(r"^\(\d+\) (Exchange|AQEShuffleRead)", block):
                for heavy in ("chunk#", "__norm#", "text#"):
                    assert heavy not in block, block
    release_curation_cache()


def test_mixture_plan_single_fact_pass(spark):
    # mixture planner: ONE parquet scan feeds the per-source aggregate;
    # cross-source totals are window sums over the #sources-row aggregate
    # output (a second .agg() branch would re-evaluate the subtree — two
    # fact scans); no join, no cartesian, no Python
    p = plan_of(spark, "corpus_mixture_plan")
    assert n_nodes(p, "Scan parquet") == 1, p
    assert "Join" not in p, p
    assert "BatchEvalPython" not in p
    assert n_nodes(p, "Window") == 1, p


def test_zorder_layout_single_pass_and_span_reduction(spark):
    import statistics

    from tests.conftest import SF_ORACLE

    # plan: ONE parquet scan; both layouts' ntiles are chained windows
    # over the same pass (a union of two selects over the keyed
    # projection would scan twice); the z-key build is pure codegen'd
    # integer projection — no join, no UDF
    p = plan_of(spark, "events_zorder_layout")
    assert n_nodes(p, "Scan parquet") == 1, p
    assert "Join" not in p, p
    assert "BatchEvalPython" not in p
    assert n_nodes(p, "Window") == 2, p

    # the layout claim itself, at the gate SF (exact — ntile over a full
    # deterministic ordering): z-ordered files are narrow in BOTH
    # dimensions at once, arrival-ordered files are not. Measured at
    # sf0.01: u_span 147.9 -> 36.7 (4.0x), v_span 272.3 -> 31.3 (8.7x);
    # the gap WIDENS with scale (sf0.1: 11.6x / 4.2x vs arrival).
    rows = REG["events_zorder_layout"].spark(spark, SF_ORACLE).collect()
    spans = {
        layout: (
            statistics.mean(r["u_span"] for r in rows if r["layout"] == layout),
            statistics.mean(r["v_span"] for r in rows if r["layout"] == layout),
        )
        for layout in ("zorder", "arrival")
    }
    assert spans["zorder"][0] * 3 < spans["arrival"][0], spans
    assert spans["zorder"][1] * 6 < spans["arrival"][1], spans


def test_neardup_cluster_keep_plan_shape(spark):
    # retention query: the scoring join broadcasts onto the components
    # output; row_number + count share ONE window partition spec — a
    # single exchange feeds both Window nodes (two specs would shuffle
    # twice); one parquet scan (components' labels come back as a
    # checkpointed RDD scan, not a re-read)
    p = plan_of(spark, "neardup_cluster_keep")
    assert n_nodes(p, "Scan parquet") == 1, p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p
    assert n_nodes(p, "Window") == 2, p
    assert n_nodes(p, "Exchange") == 1, p


def test_pq_topk_battery_plan_shape(spark):
    from etl_weather_data_pipeline_spark.plans.llmops import (
        release_curation_cache,
    )

    # PQ battery: ONE encoded codes table persists and feeds BOTH
    # branches' consumers (single: two ADC shortlists + the codes-range
    # aggregate + the count; multi: two join-shortlists) — as separate
    # queries each branch paid its own encode pass; ADC scoring is
    # table lookups in codegen — no Python workers anywhere; the only
    # joins are tiny id-set intersections, the broadcast 3-query set
    # (BroadcastNestedLoopJoin is the intended crossJoin there), and
    # the 1-row boolean crossJoins — no unbroadcast cartesian
    p = plan_of(spark, "ann_pq_topk_battery")
    assert n_nodes(p, "InMemoryTableScan") >= 5, p
    assert "BatchEvalPython" not in p
    assert "CartesianProduct" not in p
    release_curation_cache()


def test_ivfpq_topk_plan_shape(spark):
    from etl_weather_data_pipeline_spark.plans.llmops import (
        release_curation_cache,
    )

    # IVF-PQ composition: the pruned cell scan and its encoded codes
    # table each persist once (pruned feeds encode + in-cell exact +
    # count; codes feed both shortlists); no Python workers — ADC is
    # codegen'd lookups, probe choice is a tiny driver-side collect
    p = plan_of(spark, "ann_ivfpq_topk")
    assert n_nodes(p, "InMemoryTableScan") >= 4, p
    assert "BatchEvalPython" not in p
    release_curation_cache()


def test_ivfpq_residual_topk_plan_shape(spark):
    from etl_weather_data_pipeline_spark.plans.llmops import (
        release_curation_cache,
    )

    # residual IVF-PQ: residualization + encoding are map-only (the
    # centroid matrix is when-chain literals — NO join builds the
    # residuals), ADC is label-routed codegen lookups, both
    # reconstruction-error passes are single map-side aggregates; no
    # Python workers; pruned cells + residual codes persist once each
    p = plan_of(spark, "ann_ivfpq_residual_topk")
    assert n_nodes(p, "InMemoryTableScan") >= 3, p
    assert "BatchEvalPython" not in p
    assert "CartesianProduct" not in p
    release_curation_cache()


def test_bpe_apply_plan_shape(spark):
    # tokenizer application: the word-type vocab BROADCASTS into the
    # exploded fact side (the fact never shuffles before the per-source
    # aggregate); the conservation total is a 1-row broadcast; no
    # Python workers, no cartesian, no sort-merge join anywhere
    p = plan_of(spark, "corpus_bpe_apply")
    assert n_nodes(p, "BroadcastHashJoin") >= 1, p
    assert "SortMergeJoin" not in p, p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p


def test_semdedup_probe_plan_shape(spark):
    from etl_weather_data_pipeline_spark.plans.llmops import (
        release_curation_cache,
    )

    # SemDeDup probe: the union (base + planted) and the clustered frame
    # each persist once; the pairwise stage is an equi-join ON the
    # cluster id (SemDeDup's design — clustering is what bounds the
    # pairwise work); no cartesian, no Python workers
    p = plan_of(spark, "embedding_semdedup_probe")
    assert n_nodes(p, "InMemoryTableScan") >= 2, p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p
    release_curation_cache()


def test_threshold_sweep_plan_shape(spark):
    # the sweep's only non-equi join is the 5-row threshold table
    # BROADCAST against the scored pairs (BNLJ BuildLeft — the scored
    # side streams, never shuffles); candidate generation + verify stay
    # broadcast equi-joins; no cartesian, no sort-merge, no Python
    p = plan_of(spark, "neardup_threshold_sweep")
    assert n_nodes(p, "BroadcastNestedLoopJoin") == 1, p
    assert "BuildLeft" in p, p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p, p
    assert "BatchEvalPython" not in p


def test_decontaminate_eval_plan_shape(spark):
    from etl_weather_data_pipeline_spark.plans.llmops import (
        release_curation_cache,
    )

    # eval-table decontamination rides the shared passage stack: one
    # parquet scan into the persisted hash/sketch/gram caches, gram
    # matching routed through the CROSS eval/train candidate pairs only
    # — no cartesian, no full gram self-join, no Python
    p = plan_of(spark, "corpus_decontaminate_eval")
    assert n_nodes(p, "Scan parquet") <= 2, p  # stack cache + train scan
    assert n_nodes(p, "InMemoryTableScan") >= 3, p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p
    release_curation_cache()


def test_curation_pipeline_v2_plan_shape(spark):
    from etl_weather_data_pipeline_spark.plans.llmops import (
        release_curation_cache,
    )

    # v2 flagship: deduped survivors, stage-2 survivors, the LM vocab,
    # and the classifier training features each persist once (the final
    # plan reads caches, not repeated corpus scans); classifier weights
    # are plan literals — no Python workers; the only nested-loop joins
    # are the 1-row stage-count crossJoins
    p = plan_of(spark, "corpus_curation_pipeline_v2")
    assert n_nodes(p, "InMemoryTableScan") >= 4, p
    assert "BatchEvalPython" not in p
    assert "CartesianProduct" not in p
    release_curation_cache()


def test_curriculum_stages_plan_shape(spark):
    # curriculum manifest: one scan, the exact global ntile's single
    # window (the documented approx-percentile swap applies at 100 TB),
    # partial+final aggregate, no join, no Python
    p = plan_of(spark, "corpus_curriculum_stages")
    assert n_nodes(p, "Scan parquet") == 1, p
    assert "Join" not in p, p
    assert "BatchEvalPython" not in p
    assert n_nodes(p, "Window") == 1, p


def test_quality_classifier_plan_shape(spark):
    from etl_weather_data_pipeline_spark.plans.llmops import (
        release_curation_cache,
    )

    # classifier query: the regex-heavy feature frame persists ONCE and
    # feeds the 11 GD aggregates plus the final accuracy pass — the
    # final plan reads the cache, not parquet; no join, no Python
    # (weights travel as plan literals)
    p = plan_of(spark, "doc_quality_classifier")
    assert n_nodes(p, "InMemoryTableScan") == 1, p
    # the one parquet scan lives INSIDE the cached relation's plan repr
    assert n_nodes(p, "Scan parquet") <= 1, p
    assert "Join" not in p, p
    assert "BatchEvalPython" not in p
    release_curation_cache()


def test_bigram_logprob_plan_shape(spark):
    from etl_weather_data_pipeline_spark.plans.llmops import (
        release_curation_cache,
    )

    # bigram LM: the unigram vocab persists once (serves the
    # conditional join AND the V count); bigram structs explode from
    # the BOUND token-array column (explode_outer + isNotNull — the
    # inferred-filter trap); no cartesian, no Python
    p = plan_of(spark, "doc_bigram_logprob")
    assert n_nodes(p, "InMemoryTableScan") == 2, p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p
    release_curation_cache()


def test_epoch_expand_plan_shape(spark):
    # mixture materialization: the 20-row rate table broadcasts onto
    # the fact scan; copies come from a map-side sequence explode (no
    # join builds them); one aggregate shuffle; no cartesian, no Python
    p = plan_of(spark, "corpus_epoch_expand")
    assert n_nodes(p, "BroadcastHashJoin") == 1, p
    assert n_nodes(p, "Generate") == 1, p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p


def test_ivf_trained_topk_plan_shape(spark):
    from etl_weather_data_pipeline_spark.plans.llmops import (
        release_curation_cache,
    )

    # trained-quantizer IVF: the k-means-assigned table persists ONCE
    # and feeds centroids + both pruned probe scans + the n_vectors and
    # candidate-volume aggregates (five consumers — without the cache
    # every probe re-runs the k-means assignment join); probe choice is
    # a tiny driver-side collect; the only join left in the final plan
    # is the assignment equi-join + tiny top-10 intersections; no
    # cartesian, no Python workers
    p = plan_of(spark, "ann_ivf_trained_topk")
    assert n_nodes(p, "InMemoryTableScan") >= 4, p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p
    release_curation_cache()


def test_ivf_index_probe_prunes_partitions(spark, tmp_path):
    # the persisted IVF index (operators/ann_index.py) exists to make
    # the probe scan partition-bounded: the cell filter must reach the
    # scan as a PARTITION filter (directory pruning — n_probe/n_cells of
    # the store's I/O at any scale), not a post-scan Filter; and the
    # footer-level file listing must agree with the plan.
    from pyspark.sql import functions as F

    from etl_weather_data_pipeline_spark.operators import ann_index as AX
    from etl_weather_data_pipeline_spark.operators.similarity import (
        choose_probe_cells,
    )
    from etl_weather_data_pipeline_spark.plans.catalog import load

    emb = load(spark, SF_SMOKE, "embeddings")
    root = str(tmp_path / "index")
    AX.write_ivf_index(emb, root, n_cells=8, iterations=2)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()[
        "embedding"]]
    top = AX.ivf_index_topk(spark, root, qv, k=10, n_probe=3)
    plan = top._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan
    assert "BatchEvalPython" not in plan
    # footer-level agreement: probed partitions hold a strict subset of
    # the store's files, and scanning exactly those files reproduces the
    # pruned row count
    cells = [int(c) for c in choose_probe_cells(
        AX.read_ivf_centroids(spark, root), qv, 3, "cell")]
    probed = AX.probe_partition_files(root, cells)
    assert 0 < len(probed) < len(AX.all_partition_files(root))
    pruned_rows = AX.read_ivf_vectors(spark, root).filter(
        F.col("cell").isin(cells)).count()
    assert spark.read.parquet(*probed).count() == pruned_rows


def test_frame_stats_is_maponly_arrow(spark):
    # the 1->N frame fan-out happens INSIDE the Arrow batch: one
    # MapInPandas node, ZERO exchanges — at 100 TB the operator scales
    # with input splits and never shuffles payload bytes
    p = plan_of(spark, "multimodal_frame_stats")
    assert n_nodes(p, "MapInPandas") == 1, p
    assert n_nodes(p, "Exchange") == 0, p
    assert "BatchEvalPython" not in p


def test_training_export_plan_shape(spark):
    from etl_weather_data_pipeline_spark.plans.llmops import (
        release_curation_cache,
    )

    # everything the query verifies reads the WRITTEN shard store, which
    # persists ONCE and feeds both the shard-grain and sequence-grain
    # aggregates from cache (two-branch re-evaluation trap); the tiny
    # 8-row manifest/seq frames broadcast; the packer's applyInPandas
    # ran during the export write, so the verification plan itself is
    # pure JVM — no Python worker, no sort-merge join, no cartesian.
    # The query now returns an EAGER localCheckpoint so its temp shard
    # store can be removed (r12 leak fix) — capture the PRE-checkpoint
    # verification plan through the checkpoint call itself.
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    captured: list[str] = []
    orig = CDF.localCheckpoint

    def capturing(self, eager=True):
        captured.append(
            spark._jvm.PythonSQLUtils.explainString(
                self._jdf.queryExecution(), "formatted"
            )
        )
        return orig(self, eager)

    CDF.localCheckpoint = capturing
    try:
        REG["corpus_training_export"].spark(spark, SF_SMOKE).write.format(
            "noop"
        ).mode("overwrite").save()
    finally:
        CDF.localCheckpoint = orig
    assert captured, "query no longer checkpoints its result?"
    # Select the RESULT frame's plan by content, not position (r12
    # advice): only the verification frame joins the broadcast shard
    # _manifest, so a future internal checkpoint added after it cannot
    # silently re-point the pin at the wrong plan.
    cands = [p for p in captured if "_manifest" in p]
    assert cands, "no captured checkpoint contains the manifest join"
    p = cands[-1]
    assert n_nodes(p, "InMemoryTableScan") >= 2, p
    assert n_nodes(p, "BatchEvalPython") == 0
    assert n_nodes(p, "SortMergeJoin") == 0, p
    assert "CartesianProduct" not in p
    release_curation_cache()


def test_artifact_store_shared_across_queries(spark):
    """r11 artifact store (plans/artifacts.py): the per-document map
    derivations must be ONE cache shared ACROSS registry queries — the
    whole point of the store. Pin: after a cold release, the first
    consumer's plan materializes the signature artifact; a DIFFERENT
    query's plan then contains an InMemoryTableScan over the SAME
    cached relation and NO second parquet scan of the documents table
    for signature work; and the memo holds exactly one entry per
    artifact (not one per query)."""
    from etl_weather_data_pipeline_spark.plans import artifacts as AR

    AR.release_shared_artifacts()
    try:
        p1 = plan_of(spark, "doc_minhash_lsh_pairs")
        assert n_nodes(p1, "InMemoryTableScan") >= 1, p1
        n_keys = len(AR._ARTIFACTS)
        p2 = plan_of(spark, "doc_jaccard_pairs")
        # second consumer reuses the SAME entries — nothing new built
        assert len(AR._ARTIFACTS) > n_keys  # token_sets joins in
        sig_keys = [k for k in AR._ARTIFACTS if "minhash_md5" in k[2]]
        assert len(sig_keys) == 1, list(AR._ARTIFACTS)
        assert n_nodes(p2, "InMemoryTableScan") >= 2, p2
        # the LRU bound: touching a THIRD sf_dir evicts the oldest
        AR.shared_token_sets(spark, "/root/testdata/sf0.01")
        AR.shared_token_sets(spark, "/root/testdata/sf0.1")
        dirs = {k[1] for k in AR._ARTIFACTS}
        assert len(dirs) == 2 and SF_SMOKE not in dirs, dirs
    finally:
        AR.release_shared_artifacts()


def test_r11_index_ops_plan_shapes(spark, tmp_path):
    """Plan pins for the r11 index-maintenance operators (the
    new-operator rule): ivf_cell_stats is ONE parquet pass into
    partial+final hash aggregates (the per-cell skew/energy audit must
    never become a second scan or a join), and semdedup_global_audit's
    dominant k-distance probe chain is materialized ONCE (eager
    localCheckpoint) with the pair stage a cell equi-join — no
    parquet re-scan per join side, no cartesian. retrain_ivf_index is
    an action-performing maintenance op (no lazy plan to pin); its
    behavior contract lives in test_ivf_retrain_drift_and_cell_stats."""
    from etl_weather_data_pipeline_spark.operators import ann_index as AX

    emb = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "embedding")
    )
    root = str(tmp_path / "idx")
    AX.write_ivf_index(emb, root, n_cells=4, iterations=1)

    def fmt(df):
        return spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    p = fmt(AX.ivf_cell_stats(spark, root))
    assert n_nodes(p, "Scan parquet") == 1, p
    assert p.count("HashAggregate") >= 2, p
    assert "CartesianProduct" not in p and "SortMergeJoin" not in p.split(
        "Window"
    )[0], p

    p = fmt(AX.semdedup_global_audit(spark, root, n_probe=2))
    # every read below the join comes from the ONE checkpointed probe
    # table — a parquet scan here means the k-distance chain re-runs
    # per consumer (the 2+-branch re-eval rule)
    assert n_nodes(p, "Scan parquet") == 0, p
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_kmeans_centroid_memo_shared_across_consumers(spark):
    """r11 verdict directive #5: trained k-means centroids are
    vector-side session artifacts. Pins: (1) one Lloyd training pass
    per (k, iterations) key — re-running a consumer or running a second
    consumer of the same key never bumps the build counter; (2) the
    consumer plans are JOIN-FREE for assignment (map-side argmin over
    the memoized literal — kmeans_cells' old assignment join is gone);
    (3) results are the exact oracled shapes (parity is covered by the
    suite; here we pin the sharing mechanics)."""
    from etl_weather_data_pipeline_spark.plans import artifacts as AR

    AR.release_shared_artifacts()
    try:
        REG["kmeans_clusters"].spark(spark, SF_SMOKE).collect()
        n4 = AR._BUILD_COUNTS.get("kmeans_centroids_k4_i3", 0)
        assert n4 >= 1
        # same-key consumers: direct artifact access + query re-run
        sse, cents = AR.shared_kmeans_centroids(
            spark, SF_SMOKE, k=4, iterations=3
        )
        assert len(cents) == 4 and len(sse) == 3
        REG["kmeans_clusters"].spark(spark, SF_SMOKE).collect()
        assert AR._BUILD_COUNTS["kmeans_centroids_k4_i3"] == n4
        # distinct key trains separately, exactly once
        REG["ann_ivf_trained_topk"].spark(spark, SF_SMOKE).collect()
        n8 = AR._BUILD_COUNTS.get("kmeans_centroids_k8_i3", 0)
        assert n8 >= 1
        REG["ann_ivf_trained_topk"].spark(spark, SF_SMOKE).collect()
        assert AR._BUILD_COUNTS["kmeans_centroids_k8_i3"] == n8
        assert AR._BUILD_COUNTS["kmeans_centroids_k4_i3"] == n4
        # assignment is map-side: no join anywhere in kmeans_clusters
        p = plan_of(spark, "kmeans_clusters")
        for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
            assert j not in p, p
        # driver literals ride the same sf_dir LRU as the DataFrames
        AR.shared_kmeans_centroids(
            spark, "/root/testdata/sf0.01", k=4, iterations=3
        )
        AR.shared_kmeans_centroids(
            spark, "/root/testdata/sf0.1", k=4, iterations=3
        )
        dirs = {k[1] for k in AR._DRIVER_ARTIFACTS}
        assert len(dirs) == 2 and SF_SMOKE not in dirs, dirs
    finally:
        AR.release_shared_artifacts()


@pytest.mark.slow
def test_centroid_memo_timed_consumers_share_one_training_pass(spark):
    """r12 verdict directive #6: the centroid memo's Lloyd-dedup claim
    must be visible in a TIMED path. Bench accounting (bench.py):
    corpus_artifacts_build runs plans.artifacts.build_all, which now
    charges the (k=8, i=3) Lloyd build once; the two timed consumers —
    ann_ivf_trained_topk (HEADLINE) and corpus_attach_judge_semantic
    (the semantic_attach_judge callable, which freezes the memoized
    matrix into its store's quantizer) — must then consume that ONE
    build without retraining. Pin: after a cold build_all, both
    consumers run end-to-end and the k8 build counter stays exactly
    where build_all left it."""
    from etl_weather_data_pipeline_spark.plans import artifacts as AR

    AR.release_shared_artifacts()
    try:
        out = AR.build_all(spark, SF_SMOKE, k=8)
        assert out["kmeans_centroids"] == 8
        n8 = AR._BUILD_COUNTS.get("kmeans_centroids_k8_i3", 0)
        assert n8 >= 1
        REG["ann_ivf_trained_topk"].spark(spark, SF_SMOKE).collect()
        rows = REG["corpus_attach_judge_semantic"].spark(
            spark, SF_SMOKE
        ).collect()
        assert rows[0]["centroids_from_memo"] is True, rows
        assert AR._BUILD_COUNTS["kmeans_centroids_k8_i3"] == n8, (
            "a timed consumer retrained instead of hitting the memo"
        )
    finally:
        AR.release_shared_artifacts()


def test_salted_broadcast_join_matches_plain_join(spark):
    """Skew operator (operators/skew.py salted_broadcast_join): salting
    the big side and exploding the broadcast small side once per salt
    must be row-for-row identical to the plain equi-join, keep a
    BroadcastHashJoin (the big side never shuffles), and leave no salt
    column in the output."""
    from pyspark.sql import functions as F

    from etl_weather_data_pipeline_spark.operators.skew import (
        salted_broadcast_join,
    )
    from etl_weather_data_pipeline_spark.plans.catalog import load

    big = load(spark, SF_SMOKE, "customer").select(
        "c_custkey", F.col("c_nationkey").alias("nationkey")
    )
    small = load(spark, SF_SMOKE, "nation").select(
        F.col("n_nationkey").alias("nationkey"), "n_name"
    )
    got = salted_broadcast_join(big, small, "nationkey", n_salts=4)
    assert "__salt" not in got.columns
    plan = spark._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan, plan
    expected = big.join(small, "nationkey")
    exp_rows = sorted(
        map(repr, (tuple(r) for r in expected.select(sorted(expected.columns)).collect()))
    )
    got_rows = sorted(
        map(repr, (tuple(r) for r in got.select(sorted(expected.columns)).collect()))
    )
    assert got_rows == exp_rows


def test_build_all_overlap_builds_each_artifact_once(spark):
    """r14 optimization: build_all overlaps its five independent builds
    from a thread pool (guide §2.6). Pins: (a) one registry entry and
    exactly ONE build-counter bump per artifact per cold build — the
    overlap must not double-build; (b) the returned counts match the
    sequentially-derived truth; (c) concurrent _get calls for the SAME
    key register exactly one cache entry (the bookkeeping lock)."""
    from concurrent.futures import ThreadPoolExecutor

    from etl_weather_data_pipeline_spark.plans import artifacts as AR

    AR.release_shared_artifacts()
    try:
        before = dict(AR._BUILD_COUNTS)
        out = AR.build_all(spark, SF_SMOKE, k=8)
        assert set(out) == {
            "rolling_hashes",
            "minhash_sigs",
            "minhash_sigs_xxh",
            "token_sets",
            "kmeans_centroids",
        } and all(v > 0 for v in out.values()), out
        n_docs = AR._docs(spark, SF_SMOKE).count()
        assert out["rolling_hashes"] == n_docs
        assert out["token_sets"] == n_docs
        for name in (
            "rolling_hashes_k8",
            "minhash_md5_8x3",
            "minhash_xxhash64_8x3",
            "token_sets",
            "kmeans_centroids_k8_i3",
        ):
            bumped = AR._BUILD_COUNTS.get(name, 0) - before.get(name, 0)
            assert bumped == 1, (name, bumped)
        # registry holds exactly one DataFrame entry per df artifact
        assert len(AR._ARTIFACTS) == 4, list(AR._ARTIFACTS)
        # (c) same-key race: 4 threads requesting one artifact register ONE
        AR.release_shared_artifacts()
        with ThreadPoolExecutor(max_workers=4) as pool:
            dfs = list(
                pool.map(
                    lambda _: AR.shared_token_sets(spark, SF_SMOKE),
                    range(4),
                )
            )
        keys = [k for k in AR._ARTIFACTS if k[2] == "token_sets"]
        assert len(keys) == 1, list(AR._ARTIFACTS)
        assert all(df.count() == n_docs for df in dfs)
        # (d) r15 advice: the same-key race above must bump the build
        # counter ONCE (the bump rides registration, not per thread)
        assert AR._BUILD_COUNTS["token_sets"] - before.get(
            "token_sets", 0
        ) == 2, AR._BUILD_COUNTS["token_sets"]  # build_all + the race
    finally:
        AR.release_shared_artifacts()


def test_artifact_registry_eviction_during_inflight_build(spark):
    """r15 advice: a build in flight when its sf_dir is evicted or the
    registry is released must NOT re-register after the clear (the entry
    would escape the LRU budget and 'release everything'). The built
    frame is still returned — usable, just uncached — and an
    unregistered build does not bump the counter pin."""
    from etl_weather_data_pipeline_spark.plans import artifacts as AR

    AR.release_shared_artifacts()
    try:
        def sneaky():
            df = AR._docs(spark, SF_SMOKE).limit(1)
            # simulate eviction landing between build and registration
            # (builds run outside the lock, so this is the real window)
            AR.release_shared_artifacts()
            return df

        out = AR._get(spark, SF_SMOKE, "evict_probe", sneaky)
        assert out.count() == 1  # frame handed back, still usable
        assert all(k[2] != "evict_probe" for k in AR._ARTIFACTS), list(
            AR._ARTIFACTS
        )
        assert AR._BUILD_COUNTS.get("evict_probe", 0) == 0

        def sneaky_lit():
            AR.release_shared_artifacts()
            return ("literal",)

        lit = AR._get_literal(spark, SF_SMOKE, "evict_probe_lit", sneaky_lit)
        assert lit == ("literal",)
        assert all(
            k[2] != "evict_probe_lit" for k in AR._DRIVER_ARTIFACTS
        ), list(AR._DRIVER_ARTIFACTS)
        assert AR._BUILD_COUNTS.get("evict_probe_lit", 0) == 0
    finally:
        AR.release_shared_artifacts()
