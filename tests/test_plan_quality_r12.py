"""Physical-plan assertions for the round-12 data-selection entries:
the scale-critical shapes (LM tables broadcast back to the per-doc
counts, one persisted feature pass shared across plan legs, cell-join
instead of all-pairs) must be visible in explain output, not assumed."""

from __future__ import annotations

from formula1_etl_analytics_project_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = CATALOG[name].spark(spark, SF)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_dsir_broadcasts_lms_and_shares_one_feature_pass(spark):
    """Both language models must reach the scoring join as broadcasts
    (the bucket LM is <= 256 rows; shuffling the per-doc counts against
    it would re-partition the corpus-sized side for a dictionary-sized
    one), and the per-doc feature counts must come from ONE persisted
    pass (InMemoryRelation) - without it the plan scans the corpus and
    re-runs the bigram explode once per plan leg. No Python row UDFs:
    the bigram build is zip_with/slice, JVM-side."""
    plan = _plan(spark, "dsir_importance_weights")
    assert "BroadcastHashJoin" in plan
    assert "InMemoryRelation" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_semdedup_pairs_only_within_cells(spark):
    """The near-dup candidate join must be an equi join on the cell id
    (the clustering bounds the quadratic term - SemDeDup's point);
    an unkeyed CartesianProduct over the vectors would be the
    all-pairs plan this operator exists to avoid. The cell index is
    persisted once and feeds both self-join sides plus the final
    anti-join leg."""
    plan = _plan(spark, "semdedup_keep")
    assert "CartesianProduct" not in plan
    assert "InMemoryRelation" in plan


def test_soft_dedup_shuffles_hashed_longs_not_shingle_strings(spark):
    """The document-frequency shuffle must key on the 60-bit
    md5-derived BIGINT (gk), never the raw 5-gram strings - at 100 TB
    that is the difference between 8-byte and ~30-byte shuffle keys on
    the corpus-wide exchange."""
    plan = _plan(spark, "soft_dedup_weights")
    assert "hashpartitioning(gk" in plan
    assert "hashpartitioning(g#" not in plan
    assert "SortMergeJoin" not in plan or "gk" in plan
