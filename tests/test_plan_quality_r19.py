"""Physical-plan assertions for the round-19 entries: the drift /
two-sample statistics must keep the fact table out of any
single-partition window (bucketed prefix-sum decomposition), scan
counts are pinned (Catalyst re-executes unpersisted subtrees per
consumer - the recompute trap), and the encoding/eval entries stay
broadcast-only with pruned scans.
"""

from __future__ import annotations

from formula1_etl_analytics_project_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = CATALOG[name].spark(spark, SF)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_psi_drift_is_one_scan_one_shuffle_chain(spark):
    """PSI reads events exactly ONCE: the dense 5-bucket grid is
    built inside the aggregated per-type row (collect + explode +
    lookup), not by joining generator frames back against the cell
    subtree - every join-back variant re-scans the fact per consumer
    (the first cut of this entry scanned events 6x)."""
    plan = _plan(spark, "psi_drift")
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "partial_sum" in plan  # map-side combine on the one scan
    assert "SortMergeJoin" not in plan


def test_ks_two_sample_bucketed_prefix_sum_never_globally_windows_fact(
    spark,
):
    """The cumulative ECDF counts must come from per-bucket local
    windows (hashpartitioning on the bucket) plus a broadcast offset
    table; the only unpartitioned windows run on the |buckets|-row
    aggregate. Orders is scanned exactly twice (local-window arm +
    bucket-totals arm), both pruned to (price, priority) - the arm
    totals ride the broadcast offsets, so there is no third windowed
    subtree for a totals aggregate."""
    plan = _plan(spark, "ks_two_sample")
    assert plan.count("Location: InMemoryFileIndex") == 2
    assert "hashpartitioning(bucket" in plan
    assert "SortMergeJoin" not in plan
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "o_totalprice" in line and "o_orderkey" not in line


def test_mann_whitney_consumes_cum_frame_once(spark):
    """MWU aggregates the cumulative frame in ONE pass (ranks, tie
    cubes, and arm totals from the same HashAggregate) - a sibling
    totals aggregate would re-run the window pipeline and re-scan
    the fact. Same two pruned scans as ks_two_sample."""
    plan = _plan(spark, "mann_whitney_u")
    assert plan.count("Location: InMemoryFileIndex") == 2
    assert "hashpartitioning(bucket" in plan
    assert "SortMergeJoin" not in plan


def test_target_encoding_broadcasts_both_directions(spark):
    """The segment aggregate (k rows) must broadcast back into the
    fact and the customer dimension must broadcast into both passes:
    zero fact shuffles for the encoding (the naive form is a
    correlated per-row subquery). Scans: orders x2 + customer x2,
    all column-pruned - the priority column must never be read."""
    plan = _plan(spark, "target_encoding_loo")
    assert plan.count("Location: InMemoryFileIndex") == 4
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    schema = " ".join(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "o_orderpriority" not in schema
    assert "c_name" not in schema and "c_acctbal" not in schema


def test_ndcg_rankings_take_ordered_never_global_sort(spark):
    """Both the BM25 head and the ideal head must end in
    TakeOrderedAndProject over posting-filtered frames; the
    ROW_NUMBER windows run on the 10-row heads, never the corpus.
    All joins broadcast."""
    plan = _plan(spark, "ndcg_retrieval_eval")
    assert plan.count("TakeOrderedAndProject") >= 2
    assert "SortMergeJoin" not in plan
