"""Physical-plan assertions for the round-23 entries: survivorship
runs on the checkpointed edge list (one dimension scan), and the
nested-subsample tag join is a broadcast over a 2-column projection.
"""

from __future__ import annotations

from formula1_etl_analytics_project_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = CATALOG[name].spark(spark, SF)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_golden_record_graph_runs_on_checkpointed_edges(spark):
    """The blocked pair generation (the expensive part) is
    localCheckpointed once; names, CC labels, and survivorship all
    read the materialized edge list - the dimension parquet appears
    at most twice (the blocker self-join sides share the operator's
    persisted vocabulary)."""
    plan = _plan(spark, "golden_record_names")
    assert plan.count("Location: InMemoryFileIndex") <= 2
    assert "Scan ExistingRDD" in plan


def test_nested_subsample_single_scan_broadcast_tag(spark):
    """One scan of (doc_id, n_chars); the 3-row fraction table joins
    by broadcast (theta-join -> BroadcastNestedLoopJoin); the
    per-sample aggregate is map-side combinable. Text is never
    read."""
    plan = _plan(spark, "nested_subsample_stats")
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_sum" in plan
    schema = " ".join(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "text" not in schema


def test_xml_scan_prunes_to_aggregate_columns(spark):
    """The XML read must use the explicit schema AND column-prune:
    only the three aggregate inputs appear in the XML scan's
    ReadSchema (XML is text - reading unused columns means parsing
    them); the aggregate is map-side combinable on the scan."""
    plan = _plan(spark, "xml_roundtrip_scan")
    assert "Scan xml" in plan
    schema = " ".join(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "o_totalprice" in schema and "o_custkey" not in schema
    assert "partial_sum" in plan


def test_binary_files_scan_prunes_modification_time(spark):
    """The binaryFile scan must read only (path, length, content) -
    modificationTime is nondeterministic fixture state and must be
    pruned out of the checked projection."""
    plan = _plan(spark, "binary_files_scan")
    assert "Scan binaryFile" in plan
    schema = " ".join(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "content" in schema and "modificationTime" not in schema
