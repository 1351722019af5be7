"""Physical-plan assertions for the round-18 entries: Q12's
single-column predicates push to the lineitem scan while its
cross-column compare filters before the aggregate, and Q14's
one-month window prunes the fact scan with the part side broadcast.
"""

from __future__ import annotations

from formula1_etl_analytics_project_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = CATALOG[name].spark(spark, SF)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q12_pushes_inlist_and_window_to_scan(spark):
    """The IN-list on the grouping column and the one-year shipdate
    window are single-column predicates: both MUST reach the lineitem
    parquet scan (a post-scan filter reads the whole fact at 100 TB
    for a 2-value, one-year slice). The l_shipdate > o_orderdate
    compare spans tables, so it can only run post-join - but the
    aggregate must still be partial (map-side combine) and the single
    CASE column must not duplicate the join."""
    plan = _plan(spark, "sql_surface_q12")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    lineitem_pushed = " ".join(l for l in pushed if "l_shipdate" in l or "l_returnflag" in l)
    assert "l_returnflag" in lineitem_pushed
    assert "l_shipdate" in lineitem_pushed
    assert "partial_sum" in plan  # map-side combine before the exchange
    # one scan per table, no re-scan (each scan = one Location line)
    assert plan.count("Location: InMemoryFileIndex") == 2


def test_q14_prunes_scan_and_broadcasts_part(spark):
    """The one-month window must prune the lineitem scan, the small
    part side must broadcast (no fact shuffle for the join), and both
    ratio arms must come out of ONE aggregate - a second scan or a
    sort-merge exchange here is the 100x-scale bottleneck."""
    plan = _plan(spark, "sql_surface_q14")
    pushed = " ".join(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "l_shipdate" in pushed
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Location: InMemoryFileIndex") == 2
    # read only the join/ratio columns from lineitem, not the wide row
    schema = " ".join(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_comment" not in schema and "l_quantity" not in schema


def test_observe_metrics_ride_the_single_scan(spark):
    """The observed metrics must come from a CollectMetrics node in
    the business query's own plan — exactly ONE scan of lineitem; a
    second scan would mean the quality counters re-read 100 TB."""
    from formula1_etl_analytics_project_spark.sources.readers import (
        read_table,
    )
    from pyspark.sql import Observation, functions as F

    li = read_table(spark, "/root/testdata/sf0.001", "lineitem")
    obs = Observation()
    observed = li.observe(obs, F.count(F.lit(1)).alias("n_rows"))
    biz = observed.groupBy("l_returnflag").agg(F.count("*").alias("cnt"))
    plan = biz._sc._jvm.PythonSQLUtils.explainString(
        biz._jdf.queryExecution(), "formatted"
    )
    assert "CollectMetrics" in plan
    assert plan.count("Location: InMemoryFileIndex") == 1


def test_arrow_vector_stats_is_scan_then_map_no_exchange(spark):
    """mapInArrow must lower to a MapInArrow (PythonMapInArrow) node
    fed straight by the pruned scan — a narrow one-pass map with no
    exchange and no pandas conversion node."""
    plan = _plan(spark, "arrow_vector_stats")
    assert "MapInArrow" in plan
    # the only exchange allowed is read_table(spread=True)'s local[32]
    # round-robin split of the single test parquet file — never a
    # key shuffle or a single-partition collapse around the map
    assert "hashpartitioning" not in plan
    assert "SinglePartition" not in plan
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
    schema = " ".join(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "label" not in schema  # column pruning reaches the scan


def test_rrf_fusion_arms_take_ordered_and_prune_scans(spark):
    """Both retrieval arms MUST end in TakeOrderedAndProject
    (per-partition heaps + k-row driver merge) - a global sort to
    pick a top-20 is the 100 TB bottleneck. The query-vector lookup
    (vec_id = 0) and the corpus-side exclusion (vec_id <> 0) must
    reach the embeddings parquet scans as pushed filters, and the
    fusion join + rank windows run on two <= k-row frames, so no
    corpus-sized set may cross an unpartitioned window (the plan's
    Window nodes sit directly above the TakeOrdered k-row results)."""
    plan = _plan(spark, "rrf_fusion")
    # formatted explain lists each node up to twice (tree + detail):
    # 2 arm nodes -> 2-4 mentions; more would be a third top-k stage
    assert 2 <= plan.count("TakeOrderedAndProject") <= 4
    pushed = " ".join(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "EqualTo(vec_id,0)" in pushed
    assert "Not(EqualTo(vec_id,0))" in pushed
    assert "CartesianProduct" not in plan
    # windows rank the k-row TakeOrdered outputs, never a raw scan:
    # formatted explain lists each node twice (tree + detail), so the
    # 2 arm windows appear as at most 4 mentions
    assert plan.count("Window") <= 4


def test_prf_expansion_broadcasts_feedback_set_no_smj(spark):
    """The 20-row feedback set and the candidate-term list MUST reach
    the corpus token stream as broadcast-hash joins - a sort-merge
    exchange here shuffles the full corpus to meet 20 rows. All top-k
    stages lower to TakeOrderedAndProject (never a global sort), and
    the ranking is all-integer so no float expression appears at the
    boundary."""
    plan = _plan(spark, "prf_query_expansion")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("TakeOrderedAndProject") >= 2
    assert "CartesianProduct" not in plan


def test_k_anonymity_generalize_scans_corpus_once(spark):
    """The remediation step must be ONE corpus scan: the naive
    union-of-filtered-branches form re-plans the base aggregate per
    branch (Catalyst has no subtree CSE), doubling a 100 TB read. The
    retag+re-aggregate form keeps a single customer scan with a
    map-side-combinable first aggregate; the second aggregate runs on
    the |QI classes|-row class table."""
    plan = _plan(spark, "k_anonymity_generalize")
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "partial_count" in plan  # corpus aggregate combines map-side


def test_k_anonymity_audit_is_one_aggregate_no_join(spark):
    """The audit is a pure hash aggregate over the QI key - any join
    or second scan in this plan would be a smell (the sensitive-value
    distinct rides the same exchange via Expand, factor = the 2-value
    sensitive domain, not the row count)."""
    plan = _plan(spark, "k_anonymity_audit")
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "Join" not in plan


def test_t_closeness_windows_class_table_not_corpus(spark):
    """The global sensitive distribution must come from the bounded
    class table: one corpus scan, one partial corpus aggregate, and
    the empty-OVER window AFTER the class aggregate - a corpus-scale
    empty-OVER window would serialize 100 TB through one partition."""
    plan = _plan(spark, "t_closeness_audit")
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "partial_count" in plan or "partial_sum" in plan
    assert "Window" in plan  # the class-table global-ratio window
    assert "Join" not in plan


def test_benford_is_one_scan_one_aggregate(spark):
    """The digit histogram must be one corpus scan + one map-side-
    combinable aggregate to 9 rows; the share window and expectation
    CASE run on the digit table only."""
    plan = _plan(spark, "benford_digit_audit")
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "partial_count" in plan
    assert "Join" not in plan
