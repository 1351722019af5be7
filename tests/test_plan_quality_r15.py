"""Physical-plan assertions for the round-15 entries: the orphan
probe must be an anti-join on the distinct FK projection, the
equi-depth rank must come from the range-partitioned distributed
sequence (no data-scale empty-OVER window), both weighted-median
windows must share one group-key exchange, and the cogroup entry
must compile to FlatMapCoGroupsInPandas with one exchange per side."""

from __future__ import annotations

from formula1_etl_analytics_project_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = CATALOG[name].spark(spark, SF)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_late_arriving_dim_orphans_via_anti_join(spark):
    """The inferred members come from a LeftAnti join of the DISTINCT
    fact-FK projection against the known keys, and the attribution
    join back is an equi join - no Cartesian anywhere."""
    plan = _plan(spark, "late_arriving_dim")
    assert "LeftAnti" in plan
    assert "LeftOuter" in plan
    assert "CartesianProduct" not in plan


def test_equi_depth_rank_is_range_partitioned_sequence(spark):
    """The global rank must be the distributed sequence: a
    rangepartitioning exchange on the order key feeds the stamping
    pass; the only Window node is on the partition-count-sized offset
    table (hashpartitioning on the sequence pid), never on the
    fact-scale rows."""
    plan = _plan(spark, "equi_depth_histogram")
    assert "rangepartitioning(o_totalprice" in plan
    assert "hashpartitioning(__seq_pid" in plan
    # the one Window node (offset cumsum) - not a data-scale sort
    assert plan.count("(") > 0 and plan.count("Window") <= 2


def test_weighted_median_windows_share_one_group_exchange(spark):
    """Cumulative weight and group total are two windows over the SAME
    l_returnflag partitioning - the plan must contain exactly one
    hashpartitioning(l_returnflag...) exchange feeding both."""
    plan = _plan(spark, "weighted_median_groups")
    # The invariant is the SHARED exchange, asserted directly: exactly
    # one hashpartitioning(l_returnflag...) feeds both window nodes.
    # Window mentions are bounded (<=), not pinned (==): the formatted
    # explain lists each node twice today, but that count is an
    # explain-format detail, not a plan property.
    assert plan.count("hashpartitioning(l_returnflag") == 1
    assert plan.count("Window") <= 4
    assert "Exchange" in plan  # the one group exchange is present
    assert "BatchEvalPython" not in plan


def test_cogroup_compiles_to_flatmap_cogroups_in_pandas(spark):
    """The two-table grouped map must be FlatMapCoGroupsInPandas with
    one hash exchange per side on its grouping key - the Arrow
    cogroup path, not a join + grouped-map rewrite."""
    plan = _plan(spark, "cogroup_span_counts")
    assert "FlatMapCoGroupsInPandas" in plan
    assert "hashpartitioning(o_custkey" in plan
    assert "hashpartitioning(user_id" in plan
