"""Parallelism-invariance sweep: the driver's harness (and any real
cluster) may execute these plans at ANY parallelism, so every entry's
result must be a pure function of the DATA, never of the partitioning.

The classic violations this hunts: float aggregation whose value
depends on partial-sum order, window ranks with under-specified
ORDER BY ties resolved by arrival order, limit/top-k without a total
order, and iterative fixpoints whose convergence checks see
partition-dependent intermediate states. The catalog's discipline
against all four (decimal-cast sums, total-order tie-breaks,
TakeOrdered with full keys, monotone convergence sums) is asserted
here by direct experiment: run each entry at the standard 32 shuffle
partitions and again at 5, and require canonically IDENTICAL frames
via the driver-faithful harness.

The subset below is chosen adversarially - every entry whose result
flows through a float aggregate, a window rank, a global sequence, a
sampled/shuffled ordering, or an iterative fixpoint. Pure key-lookup
entries (joins on exact keys, integer counts) are structurally immune
and excluded to keep the sweep fast.
"""

from __future__ import annotations

import pytest

from formula1_etl_analytics_project_spark import oracle_harness as oh
from formula1_etl_analytics_project_spark.plans.catalog import CATALOG

SF_DIR = "/root/testdata/sf0.001"

# order-sensitivity risk classes: float aggs, windows/ranks, global
# sequences, iterative fixpoints, weighted/hashed sampling
SENSITIVE = [
    "pricing_summary",
    "star_join_revenue",
    "running_customer_total",
    "weighted_median_groups",
    "equi_depth_histogram",
    "token_budget_select",
    "epoch_shuffle_docs",
    "ntile_spend_quartiles",
    "event_value_percentiles",
    "gini_spend",
    "penny_allocation",
    "unigram_logprob_score",
    "kl_divergence_sources",
    "dsir_importance_weights",
    "kmeans_centroids",
    "pq_codes",
    "pagerank_orders",
    "dedup_clusters",
    "weighted_sample",
    "train_val_test_split",
    "top_orders",
    "mixture_resample_docs",
    # r19/r20: distributed prefix sums, rank profiles, log-space
    # window products - all order-sensitive machinery by design
    "ks_two_sample",
    "mann_whitney_u",
    "psi_drift",
    "quantile_normalization",
    "km_survival",
    "welch_ttest",
    # r21: hash-seeded replicate weights, iterative spectra, ln-ratio
    # scores - float machinery that must not see partition order
    "bootstrap_ci_mean",
    "power_iteration_pc1",
    "fs_linkage_scores",
    # r22: graph fixpoint + double argmax over window prefix sums
    "dbscan_labels",
    "best_split_finding",
    # r23: CC fixpoint over hashed string nodes + min_by survivorship
    "golden_record_names",
]


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_invariant_to_shuffle_parallelism(spark, name):
    spec = CATALOG[name]
    key = "spark.sql.shuffle.partitions"
    orig = spark.conf.get(key)
    try:
        spark.conf.set(key, "32")
        a = oh.canon_frame(oh.spark_df(spec.spark(spark, SF_DIR)))
        spark.conf.set(key, "5")
        b = oh.canon_frame(oh.spark_df(spec.spark(spark, SF_DIR)))
    finally:
        spark.conf.set(key, orig)
    assert a[0] == b[0], f"{name}: column sets differ across parallelism"
    assert a[1] == b[1], (
        f"{name}: values differ between 32 and 5 shuffle partitions - "
        "the result depends on partial-order of execution"
    )
