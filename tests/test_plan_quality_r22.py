"""Physical-plan assertions for the round-22 entries: the GBDT split
search and the SRM gate collapse the fact before anything else runs,
DBSCAN's corpus is scanned once (checkpointed edge list feeding every
graph stage), and the conformal calibration never re-scans for its
four cell-table consumers.
"""

from __future__ import annotations

from formula1_etl_analytics_project_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = CATALOG[name].spark(spark, SF)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_best_split_collapses_fact_to_histogram_first(spark):
    """One scan, one map-side combinable aggregate to <= 64 histogram
    rows - the whole point of histogram split finding; the gain
    windows run on the bounded bucket table. Only (price, priority)
    may be read."""
    plan = _plan(spark, "best_split_finding")
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "partial_sum" in plan
    assert "Join" not in plan
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "o_totalprice" in line and "o_orderkey" not in line


def test_srm_gate_is_distinct_then_two_cell_aggregate(spark):
    """Distinct users collapse map-side (partial aggregate before the
    exchange), then one 2-cell conditional aggregate - no join, no
    window, one scan of the user column only."""
    plan = _plan(spark, "ab_srm_check")
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "Join" not in plan
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "user_id" in line and "props" not in line


def test_dbscan_scans_corpus_once_graph_runs_on_checkpoints(spark):
    """The embedding parquet is scanned ONCE (the persisted cell
    index feeds both self-join sides; the checkpointed pair list
    feeds degrees, core flags, core edges, and border attachment);
    every graph stage reads materialized RDDs, not the corpus. The
    label joins against corpus keys legitimately shuffle (3 SMJs =
    6 formatted-plan mentions max)."""
    plan = _plan(spark, "dbscan_labels")
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert plan.count("SortMergeJoin") <= 6
    assert plan.count("InMemoryTableScan") + plan.count("Scan ExistingRDD") >= 2


def test_conformal_cell_table_checkpoint_prevents_rescans(spark):
    """The (split, score) cell table has four consumers (totals,
    calibration ranks, threshold, coverage) - localCheckpointed, the
    executed plan contains at most the checkpoint's own scan; the
    corpus is never re-read per consumer."""
    plan = _plan(spark, "conformal_threshold")
    assert plan.count("Location: InMemoryFileIndex") <= 1
    assert "Scan ExistingRDD" in plan
    assert "SortMergeJoin" not in plan
