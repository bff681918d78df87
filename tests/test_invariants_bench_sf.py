"""Property-oracle invariants at BENCH scale (sf0.1).

The driver's correctness gate runs the property queries at sf0.01, but
their invariants can be scale-dependent — the ann_ivf_topk self-recall
floor once held at the gate SFs and broke only at sf0.1 (caught
manually, round 5). This module makes that a CI failure: every boolean
invariant column of every property query must be TRUE at the bench SF
too. Reuses bench.py's check_invariants — the same routine
`python bench.py --check-invariants` runs.
"""

from __future__ import annotations

import os

import pytest

import bench
from etl_weather_data_pipeline_spark.plans.catalog import build_registry
from etl_weather_data_pipeline_spark.plans.llmops import (
    release_curation_cache,
)

SF_BENCH = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@pytest.mark.slow
@pytest.mark.skipif(
    not os.path.isdir(SF_BENCH), reason=f"{SF_BENCH} not present"
)
def test_property_invariants_at_bench_sf(spark):
    results = bench.check_invariants(spark, build_registry(), SF_BENCH)
    release_curation_cache()
    assert results == {n: "ok" for n in bench.PROPERTY_QUERIES}


def test_bench_name_sets_consistent():
    """Static bench-config invariants: every warmed callable, core
    member, and property query must resolve — a rename that orphans a
    bench name would otherwise surface only as a KeyError mid-bench."""
    reg = build_registry()
    assert set(bench.WARM_CALLABLES) <= set(bench.BENCH_CALLABLES)
    assert set(bench.RAISE_INVARIANT_QUERIES) <= set(
        bench.PROPERTY_QUERIES
    )
    for name in bench.PROPERTY_QUERIES + bench.CORE_R6 + bench.HEADLINE:
        if name not in bench.BENCH_CALLABLES:
            assert name in reg, name


def test_bench_summary_line_fits_tail_window():
    """r14 (r13 verdict directive #2): the driver records only the final
    2000 chars of bench stdout, and BENCH_r13's per-query line outgrew
    that window — the head (with the total) was clipped and the round's
    bench artifact recorded "parsed": null. bench.py now prints a short
    summary line LAST; pin it far under the window even with worst-case
    numeric widths so per-query growth can never clip it again."""
    import json

    line = bench.summary_line(
        total=99999.999,
        core_total=99999.999,
        n_queries=10**6,
        n_core=10**6,
        sf=0.1,
    )
    assert len(line) <= 400, len(line)
    d = json.loads(line)
    assert d["metric"] == "bench_summary"
    assert d["value"] == d["total"] == 99999.999
    assert {"core_r6_value", "core_r6_n_queries", "n_queries", "sf"} <= set(d)


def test_registry_cap_and_window_arithmetic():
    """Standing rotation-debt policy (r11 directive #2): the registry
    holds exactly 141 queries (138 rotating + 3 fixed = 47 rotating
    slots/round x 3-round cycle), the driver window is exactly the
    first 50 registry entries, every window name resolves, and the
    canaries + e2e hold their fixed slots. A consolidation or debutant
    that breaks the cap math fails here before it silently starves the
    rotation."""
    from etl_weather_data_pipeline_spark.plans.catalog import (
        _DRIVER_WINDOW_PRIORITY,
    )

    reg = build_registry()
    assert len(reg) == 141, len(reg)
    assert len(_DRIVER_WINDOW_PRIORITY) == 50
    assert list(reg)[:50] == list(_DRIVER_WINDOW_PRIORITY)
    fixed = {"kmeans_clusters", "corpus_merge_state", "weather_pipeline_e2e"}
    assert fixed <= set(_DRIVER_WINDOW_PRIORITY)
    # every oracled row still declares its oracle (a rows-only
    # regression would weaken the gate silently)
    assert all(q.oracle is not None for q in reg.values())
