"""Physical-plan assertions: the properties the 100 TB design depends
on must be visible in ``explain`` output, not assumed.

  * filters/column pruning reach the parquet scan (PushedFilters /
    ReadSchema)
  * dimension joins are broadcast (no fact-side shuffle)
  * global top-k lowers to TakeOrderedAndProject (no full sort)
  * hot-path queries contain no Python row UDFs (BatchEvalPython)
"""

from __future__ import annotations

import pytest

from formula1_etl_analytics_project_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = CATALOG[name].spark(spark, SF)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_column_pruning_reaches_scan(spark):
    plan = _plan(spark, "project_rename")
    # only the 4 projected columns in ReadSchema, not the whole table
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "c_custkey" in read_schema and "c_nationkey" not in read_schema


def test_star_join_broadcasts_dimensions(spark):
    plan = _plan(spark, "star_join_revenue")
    # three broadcast joins (customer, nation, region); the fact side
    # must not shuffle for them
    assert plan.count("BroadcastHashJoin") >= 3


def test_topk_uses_take_ordered(spark):
    plan = _plan(spark, "top_orders")
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan  # no global sort operator


def test_no_python_row_udfs_in_oracle_queries(spark):
    """Everything SQL-checkable must stay JVM-side (whole-stage
    codegen); Python appears only in explicitly-UDF operators."""
    for name, spec in CATALOG.items():
        if not spec.oracle:
            continue
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan, f"{name} uses a row UDF"
        assert "ArrowEvalPython" not in plan, f"{name} uses a pandas UDF"


def test_dedup_uses_single_shuffle_with_partial_limit(spark):
    plan = _plan(spark, "dedup_first_order")
    # window keep-first = exactly one exchange (hash by key)
    assert plan.count("Arguments: hashpartitioning") == 1
    # and Spark's WindowGroupLimit kicks in map-side: only 1 row per key
    # per partition reaches the shuffle (the rn=1 filter was pushed)
    assert "row_number(), 1, Partial" in plan
