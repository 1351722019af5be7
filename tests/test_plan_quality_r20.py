"""Physical-plan assertions for the round-20 entries: the statistics
collapse the fact in one map-side-combinable pass (scan counts
pinned), contingency marginals come from windows over the bounded
cell table (never re-derived subtrees), and the survival / release
entries keep their unpartitioned windows on bounded frames only.
"""

from __future__ import annotations

from formula1_etl_analytics_project_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = CATALOG[name].spark(spark, SF)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_welch_is_one_scan_one_conditional_aggregate(spark):
    """Both arms and both moments must come out of ONE pass over
    (price, priority) - a per-arm filter-then-aggregate shape scans
    the fact twice and a centered variance pass three times."""
    plan = _plan(spark, "welch_ttest")
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "partial_sum" in plan
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "o_totalprice" in line and "o_orderkey" not in line


def test_cramers_v_marginals_window_the_cell_table(spark):
    """The contingency cell table (25 rows) is consumed ONCE, with
    row/column/total marginals as windows over it - the join-back
    formulation consumes the cell subtree three times and re-scans
    the fact per consumer. Scans: orders + customer, once each,
    dimension broadcast."""
    plan = _plan(spark, "cramers_v")
    assert plan.count("Location: InMemoryFileIndex") == 2
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_quantile_normalization_ranks_partition_by_source(spark):
    """The rank window must partition BY SOURCE (parallel across
    sources; a global rank would funnel the corpus through one
    partition), and the profile map-back is an equi-join on rank.
    Two scans of documents (rank arm + profile arm), both pruned to
    (doc_id, source, n_chars) - text must never be read."""
    plan = _plan(spark, "quantile_normalization")
    # the ranked frame is checkpointed (it feeds the profile AND the
    # map-back; unchecked it re-ran the sort window twice), so the
    # final plan reads the checkpoint - no second documents scan
    assert "Scan parquet" not in plan
    assert plan.count("Scan ExistingRDD") >= 2
    # pin the window shape on the pre-checkpoint subtree
    from pyspark.sql import Window, functions as F

    from formula1_etl_analytics_project_spark.sources.readers import (
        read_table,
    )

    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = read_table(spark, SF, "documents", spread=True).select(
        "doc_id", "source", "n_chars", F.row_number().over(w).alias("rk")
    )
    rplan = ranked._sc._jvm.PythonSQLUtils.explainString(
        ranked._jdf.queryExecution(), "formatted"
    )
    assert "hashpartitioning(source" in rplan
    schema = " ".join(l for l in rplan.splitlines() if "ReadSchema" in l)
    assert "text" not in schema


def test_km_survival_windows_only_the_lifetime_table(spark):
    """One scan of events into the per-user lifetime aggregate; the
    unpartitioned windows run on the distinct-lifetime table, whose
    cardinality is calendar-bounded - the WindowExec single-partition
    warning here is the bounded-table case, not a fact funnel. The
    per-user collapse must be map-side combinable."""
    plan = _plan(spark, "km_survival")
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "partial_min" in plan or "partial_max" in plan


def test_dp_release_is_one_aggregate_plus_scalar_noise(spark):
    """One map-side-combinable count to |sources| rows; the Laplace
    arithmetic is pure projection over the k-row release table - no
    join, no window, no second scan."""
    plan = _plan(spark, "dp_noisy_release")
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "partial_count" in plan
    assert "Join" not in plan
