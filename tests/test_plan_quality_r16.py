"""Physical-plan assertions for the round-16 entries: novelty grams
must shuffle as 60-bit longs off a SINGLE persisted tokenize pass,
and Q9's dimensions must broadcast around the one fact scan."""

from __future__ import annotations

from formula1_etl_analytics_project_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = CATALOG[name].spark(spark, SF)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_novelty_gram_pass_runs_once_and_shuffles_longs(spark):
    """The (doc, gram-hash) distinct feeds two consumers (first-seen
    aggregate + join probe); it must be persisted so both read the
    cached pass (InMemoryTableScan) instead of re-exploding the
    corpus, and the shuffles must key on the 60-bit gk long, never
    the gram string."""
    plan = _plan(spark, "ngram_novelty")
    assert "InMemoryTableScan" in plan
    # one parquet scan feeding the cached relation - not one per branch
    assert "hashpartitioning(gk" in plan
    assert "gram#" not in plan.split("Exchange")[1][:200]


def test_q9_broadcasts_all_dims_single_fact_pass(spark):
    """part (LIKE-filtered), supplier, nation must broadcast; the
    measure mixes lineitem and part columns, so p_retailprice must
    survive into the post-join project. No Cartesian, no Python."""
    plan = _plan(spark, "sql_surface_q9")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert "p_retailprice" in plan
    assert "BatchEvalPython" not in plan
