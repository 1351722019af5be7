"""Physical-plan assertions for the round-17 entries: Q6 must push
all three predicates to the scan, Q15's tie filter must be a scalar
subquery over the pushdown-pruned aggregate, and the batching report
must be one corpus pass of map-side-combinable aggregates."""

from __future__ import annotations

from formula1_etl_analytics_project_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = CATALOG[name].spark(spark, SF)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q6_pushes_all_three_predicates(spark):
    """The whole query is scan + aggregate; date range, discount band
    and quantity cap must ALL appear as pushed parquet filters - any
    predicate evaluated post-scan reads the full fact at 100 TB for a
    2% selection."""
    plan = _plan(spark, "sql_surface_q6")
    pushed = plan.split("PushedFilters")[1].splitlines()[0]
    assert "l_shipdate" in pushed
    assert "l_discount" in pushed
    assert "l_quantity" in pushed
    assert "Join" not in plan


def test_q15_tie_filter_is_scalar_subquery_over_pruned_scans(spark):
    """The WITH-TIES filter must compile to a scalar Subquery compared
    against the aggregated revenue (never a sort-limit, which drops
    ties); every lineitem scan must carry the pushed 3-month date
    range."""
    plan = _plan(spark, "sql_surface_q15")
    assert "Subquery" in plan
    assert "TakeOrderedAndProject" not in plan.split("Sort")[0]
    for section in plan.split("PushedFilters")[1:]:
        head = section.splitlines()[0]
        if "l_shipdate" in head:
            assert "GreaterThanOrEqual(l_shipdate" in head
            assert "LessThan(l_shipdate" in head


def test_length_buckets_are_one_pass_map_side_combinable(spark):
    """One parquet scan, hash aggregates with a partial stage before
    the exchange (map-side combine), no join, no Python eval - the
    report must cost one corpus pass."""
    plan = _plan(spark, "length_bucket_batching")
    assert plan.count("Scan parquet") == 2  # one scan: tree + details
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2
