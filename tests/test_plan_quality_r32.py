"""Semantics assertions for the round-32 dedup audit rollups."""

from __future__ import annotations

from pyspark.sql import functions as F

from formula1_etl_analytics_project_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def test_cluster_stats_accounts_for_every_doc(spark):
    """The histogram's doc mass equals the corpus; removable = docs -
    clusters per row; singleton row present (most docs are unique)."""
    rows = CATALOG["dedup_cluster_size_stats"].spark(spark, SF).collect()
    assert sum(r["n_docs"] for r in rows) == 500
    for r in rows:
        assert r["n_removable"] == r["n_docs"] - r["n_clusters"]
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]
    sizes = {r["cluster_size"] for r in rows}
    assert 1 in sizes
    assert max(sizes) >= 2  # seeded near-dups cluster


def test_cluster_stats_consistent_with_labels(spark):
    """Recompute the histogram from the base entry's labels."""
    labels = CATALOG["dedup_clusters"].spark(spark, SF).collect()
    from collections import Counter

    csizes = Counter(Counter(r["cluster_id"] for r in labels).values())
    rows = CATALOG["dedup_cluster_size_stats"].spark(spark, SF).collect()
    got = {r["cluster_size"]: r["n_clusters"] for r in rows}
    assert got == dict(csizes)


def test_minhash_error_within_variance_budget(spark):
    """The 8-hash estimator's mean |error| on truth pairs must sit
    within ~2x its theoretical sd (sqrt(j(1-j)/8) <= 0.177) - a real
    bias bug (wrong hash pairing, off-by-one in the band split)
    blows past this immediately; estimates are multiples of 1/8."""
    r = CATALOG["minhash_estimate_error"].spark(spark, SF).collect()[0]
    assert r["n_pairs"] > 0
    assert 0.0 <= r["mean_abs_err"] <= 0.35
    assert r["max_abs_err"] <= 0.6
    truth = CATALOG["prefix_jaccard_pairs"].spark(spark, SF).count()
    assert r["n_pairs"] == truth


def test_minhash_error_join_is_id_pruned(spark):
    """The signature side is semi-join pruned to docs appearing in
    truth pairs before shingling - the corpus never builds signatures
    for docs that cannot contribute."""
    df = CATALOG["minhash_estimate_error"].spark(spark, SF)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
