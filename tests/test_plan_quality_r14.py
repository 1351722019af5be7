"""Physical-plan assertions for the round-14 entries: the ON-clause
filter must reach the orders scan below the outer join, the Q17
correlated AVG must decorrelate, Q19's disjunctions must split to
both scans, and the token-budget prefix sum must run bucket-
partitioned (never a corpus-scale single-partition window)."""

from __future__ import annotations

from formula1_etl_analytics_project_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = CATALOG[name].spark(spark, SF)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q13_on_clause_filter_pushes_below_outer_join(spark):
    """The ON-clause priority predicate filters join MATCHES, not
    customer rows, so it is safe (and required, at 100 TB) to push it
    to the orders scan below the LeftOuter join - unmatched customers
    still surface with c_count 0 via the outer side."""
    plan = _plan(spark, "sql_surface_q13")
    assert "LeftOuter" in plan
    assert "Not(EqualTo(o_orderpriority,1-URGENT))" in plan
    assert "CartesianProduct" not in plan


def test_q17_correlated_avg_decorrelates_to_aggregate_join(spark):
    """The correlated scalar AVG must become an aggregate of lineitem
    keyed on l_partkey joined back to the fact - never a per-row
    re-execution (no Python eval, no nested-loop re-scan)."""
    plan = _plan(spark, "sql_surface_q17")
    assert "hashpartitioning(l_partkey" in plan
    assert plan.count("HashAggregate") >= 3  # partial+final avg, final agg
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_q19_disjunction_splits_to_both_scans(spark):
    """CNF extraction must push the part-only OR (brand/size) to the
    part scan and the lineitem-only OR (quantity ranges) to the
    lineitem scan; both appear as pushed parquet filters so row-group
    min/max pruning acts before the join."""
    plan = _plan(spark, "sql_surface_q19")
    lineitem_pushed = [
        s for s in plan.split("PushedFilters")[1:] if "l_quantity" in s[:400]
    ]
    part_pushed = [
        s for s in plan.split("PushedFilters")[1:] if "p_brand" in s[:400]
    ]
    assert lineitem_pushed and "Or(" in lineitem_pushed[0][:400]
    assert part_pushed and "Or(" in part_pushed[0][:400]
    assert "BroadcastHashJoin" in plan


def test_calendar_dim_is_generate_over_one_row_aggregate(spark):
    """The spine must be a Generate (sequence explode) fed by the
    1-row min/max aggregate - no join, no fact-scale shuffle beyond
    the bounds aggregate itself."""
    plan = _plan(spark, "calendar_dim")
    assert "Generate" in plan
    assert "Join" not in plan
    # formatted explain lists each node twice (tree + details):
    # exactly one physical scan -> exactly two mentions
    assert plan.count("Scan parquet") == 2


def test_token_budget_prefix_sum_is_bucket_partitioned(spark):
    """The corpus-scale cumulative sum must run under a window
    partitioned by the score-range bucket (visible as a
    hashpartitioning(bucket...) exchange); the only unpartitioned
    window is the 64-row bucket-offset table. The budget scalar and
    offsets come back as broadcasts."""
    plan = _plan(spark, "token_budget_select")
    assert "hashpartitioning(bucket" in plan
    assert plan.count("Window") >= 2
    assert "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan


def test_perplexity_buckets_window_partitions_by_source(spark):
    """The NTILE window must partition by source (parallel across
    domains); its exchange is hashpartitioning(source...) - a global
    sort of the scored corpus would be the scale killer."""
    plan = _plan(spark, "perplexity_buckets")
    assert "hashpartitioning(source" in plan
    assert "ntile(3)" in plan
