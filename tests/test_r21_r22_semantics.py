"""Semantic invariants for the round-21/22 entries, beyond oracle
parity: bootstrap interval ordering, DBSCAN role/label consistency,
split-gain bounds, and the conformal coverage guarantee.
"""

from __future__ import annotations

from formula1_etl_analytics_project_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def test_bootstrap_interval_is_ordered(spark):
    r = CATALOG["bootstrap_ci_mean"].spark(spark, SF).collect()[0]
    assert r["n_reps"] == 100
    assert r["ci_lo"] <= r["ci_hi"]
    # replicate means concentrate around the sample mean; the 2.5/97.5
    # band is tight for n=1500 draws of bounded prices
    assert r["ci_lo"] > 0


def test_dbscan_roles_and_labels_are_consistent(spark):
    rows = CATALOG["dbscan_labels"].spark(spark, SF).collect()
    cores = {r["vec_id"]: r["cluster"] for r in rows if r["role"] == "core"}
    core_clusters = set(cores.values())
    assert cores, "eps/minPts must produce cores on the testdata"
    for r in rows:
        if r["role"] == "core":
            # min-label CC: the label is the smallest core id in the
            # component, so it can never exceed the member's own id
            assert r["cluster"] <= r["vec_id"]
            assert r["cluster"] in cores  # labels are core ids
        elif r["role"] == "border":
            assert r["cluster"] in core_clusters
        else:
            assert r["cluster"] == -1


def test_split_gain_is_bounded(spark):
    r = CATALOG["best_split_finding"].spark(spark, SF).collect()[0]
    assert 0 <= r["best_bucket"] < 64
    # Gini gain of a binary split is bounded by the parent impurity
    # (itself <= 0.5 for a binary label)
    assert 0.0 <= r["gini_gain"] <= 0.5
    assert r["split_value"] == (r["best_bucket"] + 1) * 8192.0


def test_conformal_coverage_meets_guarantee(spark):
    r = CATALOG["conformal_threshold"].spark(spark, SF).collect()[0]
    assert r["n_cal"] + r["n_test"] > 0
    # split conformal at alpha=0.1 guarantees >= 90% expected
    # coverage; allow binomial slack at the testdata's n_test
    assert r["coverage"] >= 0.8
    assert r["coverage"] <= 1.0
