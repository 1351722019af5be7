"""Physical-plan assertions for the round-21 entries: the bootstrap's
x100 explode must collapse map-side before its one exchange, the
linkage vocabulary and the spectral mean vector are persisted (scan
counts pinned), and the power iteration stays broadcast + hash-agg
with no sort-merge join anywhere.
"""

from __future__ import annotations

from formula1_etl_analytics_project_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = CATALOG[name].spark(spark, SF)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bootstrap_is_one_scan_with_mapside_combine(spark):
    """The Poisson bootstrap must be ONE scan of (orderkey, price)
    with partial aggregation between the explode and the exchange -
    the whole point of per-row replicate weights is that the x100
    blow-up never crosses the wire (<= B cells per partition)."""
    plan = _plan(spark, "bootstrap_ci_mean")
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "partial_sum" in plan
    assert "SortMergeJoin" not in plan
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "o_totalprice" in line and "o_orderpriority" not in line


def test_fs_linkage_persists_the_vocabulary(spark):
    """The distinct-name vocabulary feeds blockers, both field sides,
    and three u-estimates: unpersisted it re-scans the dimension 12x
    (measured); persisted, exactly ONE parquet scan with every other
    consumer reading the cache."""
    plan = _plan(spark, "fs_linkage_scores")
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert plan.count("InMemoryTableScan") >= 8
    assert "SortMergeJoin" not in plan


def test_wilson_ci_single_funnel_consumer(spark):
    """The two (step, n, k) rows must be EXPLODED from one aggregate
    row - a UNION of two selects would run the |users|-sized funnel
    twice. The funnel's stage cascade inherently re-derives earlier
    stages (v:3 + c:2 + p:1 = 6 partial_min aggregates, same as the
    accepted event_funnel shape); a second funnel consumer would
    double that to 12."""
    plan = _plan(spark, "wilson_funnel_ci")
    assert "Generate" in plan
    assert plan.count("partial_min") <= 6


def test_power_iteration_spectrum_broadcasts_dot_join_shuffles(spark):
    """The 64-row spectrum/mean tables must join the corpus stream by
    BROADCAST (never shuffle the corpus to meet 64 rows). The y-half's
    exc-to-dots join is corpus x corpus-rows and legitimately
    sort-merges - but at most ONE such join per iteration (3 total);
    more means a bounded table started shuffling. Corpus scans stay
    at 7 (six matvec-half consumers + one mu build) with the
    persisted mu/v tables read from cache - the documented
    re-scan-vs-materialize trade."""
    # Build the plan from a COLD cache: a long suite run accumulates
    # dozens of persisted frames whose presence (or memory-pressure
    # eviction) perturbs the scan/cache-read counts this test pins.
    spark.catalog.clearCache()
    plan = _plan(spark, "power_iteration_pc1")
    assert 1 <= plan.count("Location: InMemoryFileIndex") <= 7
    assert plan.count("InMemoryTableScan") >= 6
    # formatted explain mentions each node twice (tree + detail):
    # 3 actual sort-merge joins = 6 mentions
    assert plan.count("SortMergeJoin") <= 6
    assert plan.count("BroadcastHashJoin") >= 6
    assert "partial_sum" in plan
