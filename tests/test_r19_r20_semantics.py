"""Semantic invariants for the round-19/20 statistics entries, beyond
oracle parity: the bucketed prefix-sum decomposition must be
independent of the bucketing (the exactness claim, tested directly),
PSI terms are individually non-negative, and the KM curve is a
monotone survival function.
"""

from __future__ import annotations

import math

from formula1_etl_analytics_project_spark.plans import catalog_r19 as r19
from formula1_etl_analytics_project_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def test_ks_bucket_width_invariance(spark):
    """local-cumsum + bucket-offset == global prefix sum for ANY
    monotonic bucketing - the decomposition's exactness claim. Run
    the same query under a deliberately ragged prime width and the
    default; byte-identical results required (this is the same
    invariant the parallelism sweep checks for physical partitioning,
    here for the logical bucketing)."""
    base = CATALOG["ks_two_sample"].spark(spark, SF).collect()
    old = r19._CUM_BUCKET_WIDTH
    try:
        r19._CUM_BUCKET_WIDTH = 509.0
        alt = CATALOG["ks_two_sample"].spark(spark, SF).collect()
        r19._CUM_BUCKET_WIDTH = 1e12  # one bucket: degenerate case
        one = CATALOG["ks_two_sample"].spark(spark, SF).collect()
    finally:
        r19._CUM_BUCKET_WIDTH = old
    assert base == alt == one


def test_mwu_matches_ks_arm_counts(spark):
    """Both statistics must see the identical arm split (same helper,
    same filters) - a drift between them means one entry's arm
    definition silently changed."""
    ks = CATALOG["ks_two_sample"].spark(spark, SF).collect()[0]
    mwu = CATALOG["mann_whitney_u"].spark(spark, SF).collect()[0]
    assert (ks["n_a"], ks["n_b"]) == (mwu["n_a"], mwu["n_b"])
    # U is bounded by the product of arm sizes
    assert 0.0 <= mwu["u1"] <= ks["n_a"] * ks["n_b"]


def test_psi_is_nonnegative(spark):
    """Each PSI term (p-q)ln(p/q) is >= 0 (both factors share sign),
    so every per-type PSI must be >= 0 - a negative value means the
    smoothing or the grid densification broke."""
    rows = CATALOG["psi_drift"].spark(spark, SF).collect()
    assert rows and all(r["psi"] >= 0.0 for r in rows)


def test_km_curve_is_monotone_survival(spark):
    """S(t) must start <= 1, be non-increasing in duration, and stay
    in [0, 1]; n_risk must be non-increasing as well."""
    rows = CATALOG["km_survival"].spark(spark, SF).collect()
    assert rows
    prev_s, prev_risk = 1.0, math.inf
    for r in rows:
        assert 0.0 <= r["s_hat"] <= prev_s + 1e-12
        assert r["n_risk"] <= prev_risk
        prev_s, prev_risk = r["s_hat"], r["n_risk"]
