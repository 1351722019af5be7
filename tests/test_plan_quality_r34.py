"""Plan and semantics assertions for incremental_join_maintenance:
the delta pass scans only delta rows with the cutoff pushed down, the
base view is a checkpoint (never rebuilt), dimensions broadcast, and
the merged view equals a one-shot recompute bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from formula1_etl_analytics_project_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = CATALOG[name].spark(spark, SF)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_delta_pass_pushes_cutoff_and_base_is_checkpointed(spark):
    """The final plan contains exactly one orders scan (the delta
    pass) with the cutoff pushed to parquet; the base view enters as
    an ExistingRDD checkpoint; dimensions broadcast."""
    plan = _plan(spark, "incremental_join_maintenance")
    assert plan.count("Location: InMemoryFileIndex [file:") >= 1
    orders_scans = [
        l for l in plan.splitlines() if "orders.parquet" in l
    ]
    assert len(orders_scans) == 1  # only the delta pass reads orders
    pushed = " ".join(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "GreaterThanOrEqual(o_orderdate" in pushed or "o_orderdate" in pushed
    assert "Scan ExistingRDD" in plan
    assert "BroadcastHashJoin" in plan


def test_merged_view_equals_full_recompute(spark):
    """The incremental result must be IDENTICAL (values, not just
    close) to a one-shot aggregate over all orders - the correctness
    contract of incremental maintenance."""
    got = {
        r["nation"]: r
        for r in CATALOG["incremental_join_maintenance"]
        .spark(spark, SF)
        .collect()
    }
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    full = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(30,4)"))
            .cast("double")
            .alias("revenue"),
        )
        .collect()
    )
    assert len(got) == len(full) == 25
    for r in full:
        g = got[r["nation"]]
        assert g["n_orders"] == r["n_orders"]
        assert g["revenue"] == r["revenue"]  # bit-identical, not approx


def test_both_sides_of_cutoff_contribute(spark):
    """The cutoff actually splits the data (both the base view and
    the delta are non-empty), so the merge path is genuinely
    exercised rather than degenerating to one side."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    n_base = orders.filter(
        F.col("o_orderdate").cast("date") < F.lit("1996-01-01").cast("date")
    ).count()
    n_delta = orders.count() - n_base
    assert n_base > 0 and n_delta > 0
