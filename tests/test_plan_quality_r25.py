"""Physical-plan and invariant assertions for the round-25 entries:
the coverage curve's window runs on a TakeOrdered top-50, the
pinball forecaster broadcasts, negatives resolve through one
id-keyed join, and the diversity rollup reuses the first exchange.
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


def test_vocab_coverage_window_runs_on_takeordered_top50(spark):
    """The full vocabulary is never globally sorted: the rank +
    prefix-sum window consumes a TakeOrderedAndProject top-50, and
    the type histogram is map-side combinable."""
    plan = _plan(spark, "vocab_coverage_curve")
    assert "TakeOrderedAndProject" in plan
    # the token histogram is checkpointed (it feeds the total AND the
    # top-50 cut); the final plan reads the checkpoint
    assert "Scan ExistingRDD" in plan
    assert "Scan parquet" not in plan
    assert "SortMergeJoin" not in plan


def test_vocab_coverage_curve_is_monotone_and_clamped(spark):
    """Coverage must be nondecreasing in k, end at 1.0 for k beyond
    the observed vocabulary (k=50 > 31 types), and covered must
    never exceed total."""
    rows = CATALOG["vocab_coverage_curve"].spark(spark, SF).collect()
    cov = [r["coverage"] for r in rows]
    assert cov == sorted(cov)
    assert rows[-1]["coverage"] == 1.0
    assert all(r["covered"] <= r["total"] for r in rows)


def test_pinball_forecaster_broadcasts_to_fact_scan(spark):
    """The k_types x 3 forecaster table must broadcast; the loss
    aggregate is map-side combinable on the fact side. A sort-merge
    join here would shuffle the fact table for a 15-row dimension."""
    plan = _plan(spark, "quantile_pinball_eval")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pinball_median_beats_extremes_at_q50(spark):
    """Structural property: among constant predictors, the median
    minimizes q=0.5 pinball loss - so the q=0.5 row's loss must not
    exceed the loss the same data would give against the q=0.1 or
    q=0.9 predictor values."""
    rows = CATALOG["quantile_pinball_eval"].spark(spark, SF).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], {})[r["q"]] = r
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_type", "value")
        .toPandas()
    )
    for etype, qs in by_type.items():
        vals = ev[ev["event_type"] == etype]["value"]
        for alt in (0.1, 0.9):
            yhat = qs[alt]["qhat"]
            loss_alt = (
                vals.map(
                    lambda v: max(0.5 * (v - yhat), -0.5 * (v - yhat))
                ).mean()
            )
            assert qs[0.5]["pinball"] <= loss_alt + 1e-6


def test_contrastive_negatives_deterministic_and_cross_source(spark):
    """Two evaluations produce identical pairs (hash ring, no rand),
    and no negative shares the anchor's source or id."""
    a = CATALOG["contrastive_negatives"].spark(spark, SF).collect()
    b = CATALOG["contrastive_negatives"].spark(spark, SF).collect()
    assert a == b
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "source")
        .toPandas()
        .set_index("doc_id")["source"]
    )
    for r in a:
        assert r["neg_id"] != r["anchor_id"]
        assert docs[r["anchor_id"]] != r["neg_source"]
        assert docs[r["neg_id"]] == r["neg_source"]


def test_lexdiv_second_exchange_moves_collapsed_histogram(spark):
    """The corpus-scale exchange is the (source, type) histogram;
    the per-source rollup adds exactly one more exchange whose input
    is the collapsed histogram, never the token stream - and both
    aggregates are map-side combinable."""
    plan = _plan(spark, "lexical_diversity_report")
    # formatted explain puts partitioning in the node's Arguments line
    assert plan.count("hashpartitioning(") == 2
    assert plan.count("partial_count") >= 1
    schema = " ".join(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "doc_id" not in schema and "lang" not in schema


def test_lexdiv_values_consistent(spark):
    """hapax_frac in [0,1]; ttr = n_types/n_tokens to rounding; every
    source row present."""
    rows = CATALOG["lexical_diversity_report"].spark(spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0.0 <= r["hapax_frac"] <= 1.0
        assert abs(r["ttr"] - r["n_types"] / r["n_tokens"]) < 1e-6
