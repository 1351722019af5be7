"""Physical-plan and invariant assertions for the round-26 entries:
winnowing windows partition by document, the fingerprint self-join is
equi-keyed (never a nested loop) with its hot-key cap applied before
the join, the datasheet is a single scan with one exchange, and the
EMA's day-dimension join broadcasts with exact-decimal weights.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from formula1_etl_analytics_project_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = CATALOG[name].spark(spark, SF)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_winnow_window_partitions_by_document(spark):
    """The window-min runs per document (millions of independent
    small windows), never a global sort: its exchange is keyed on
    doc_id and there is no global Sort outside the final ORDER BY."""
    plan = _plan(spark, "winnow_fingerprints")
    assert "hashpartitioning(doc_id" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_winnow_fingerprint_invariants(spark):
    """Winnowing keeps a subset of gram hashes: n_fp <= n_grams,
    density in (0, 1], digest is a 32-hex md5, and every doc with
    >= 4 tokens appears exactly once."""
    rows = CATALOG["winnow_fingerprints"].spark(spark, SF).collect()
    assert len(rows) == 500
    assert len({r["doc_id"] for r in rows}) == 500
    for r in rows:
        assert 1 <= r["n_fp"] <= r["n_grams"]
        assert 0.0 < r["fp_density"] <= 1.0
        assert len(r["fp_digest"]) == 32


def test_winnow_pairs_join_is_equi_keyed_and_capped(spark):
    """Candidate pairs come from an equi-join on the 60-bit
    fingerprint - no nested loop anywhere - and the stop-fingerprint
    cap (nd BETWEEN 2 AND 50) filters the inverted index BEFORE the
    self-join, so it must appear as a post-aggregate filter, not a
    post-join one."""
    plan = _plan(spark, "winnow_dup_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the nd-cap filter feeds the join: a Filter on the count alias
    # exists and the join keys include fp
    assert "(fp" in plan or "fp#" in plan


def test_winnow_pairs_detect_seeded_near_dups(spark):
    """testdata seeds near-duplicate documents; the winnow candidate
    generator must surface pairs, each with >= 2 shared fingerprints,
    est_jaccard in (0, 1], and doc_a < doc_b."""
    rows = CATALOG["winnow_dup_pairs"].spark(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert r["shared_fps"] >= 2
        assert 0.0 < r["est_jaccard"] <= 1.0


def test_datasheet_is_one_scan(spark):
    """The datasheet composes five signal families into ONE pass:
    exactly one parquet scan of documents (formatted explain prints
    each node twice: tree line + detail header), and the only
    exchanges are the two-phase distinct's (source, fp) hop and the
    final source rollup - both move collapsed aggregates, never the
    text column; every aggregate combines map-side."""
    plan = _plan(spark, "source_datasheet")
    assert plan.count("Scan parquet") == 2
    assert plan.count("hashpartitioning(source") == 2
    assert "partial_count" in plan
    # no exchange ships the raw text column
    for block in plan.split("\n\n"):
        if block.lstrip().startswith("(") and "Exchange" in block.splitlines()[0]:
            assert "text#" not in block or "RoundRobin" in block


def test_datasheet_values_consistent(spark):
    """Per-source invariants: rates in [0,1], token/char masses
    positive, and the doc counts sum to the corpus size."""
    rows = CATALOG["source_datasheet"].spark(spark, SF).collect()
    assert sum(r["n_docs"] for r in rows) == 500
    for r in rows:
        assert 0.0 <= r["exact_dup_rate"] < 1.0
        assert 0.0 <= r["en_frac"] <= 1.0
        assert 0.0 < r["mean_quality"] <= 1.0
        assert r["n_tokens"] > 0 and r["n_chars"] > 0


def test_ema_day_join_broadcasts(spark):
    """The 20-day trailing join runs on the bounded day dimension and
    must broadcast - a sort-merge join here would shuffle the daily
    rollup twice for a <=10k-row dimension."""
    plan = _plan(spark, "ema_revenue_trend")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ema_matches_bruteforce_pandas(spark):
    """Value check against an independent pandas recomputation with
    the same exact-decimal weight table: pick 5 days spread across
    the range and compare ema20 to 1e-9."""
    rows = CATALOG["ema_revenue_trend"].spark(spark, SF).collect()
    daily = {r["day"]: r for r in rows}
    import pandas as pd

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    orders["day"] = pd.to_datetime(orders["o_orderdate"]).dt.date
    rev = (
        orders.groupby("day")["o_totalprice"]
        .apply(lambda s: sum(Decimal(str(round(v, 2))) for v in s))
        .to_dict()
    )
    weights = [
        (Decimal(8) ** d / Decimal(10) ** d).quantize(Decimal("0.000001"))
        for d in range(20)
    ]
    days = sorted(daily)
    for day in days[:: max(1, len(days) // 5)][:5]:
        num = Decimal(0)
        den = Decimal(0)
        for lag in range(20):
            d2 = day - pd.Timedelta(days=lag).to_pytimedelta()
            if d2 in rev:
                num += weights[lag] * rev[d2]
                den += weights[lag]
        # Mirror the production entry (catalog_r26.py): the exact
        # decimal numerator is round(4)ed (HALF_UP) BEFORE the double
        # cast so its scaled integer stays under 2^53 at sf1.
        num = num.quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
        expect = float(num) / float(den)  # unrounded single division
        assert abs(daily[day]["ema20"] - expect) < 1e-9


def test_ema_weights_exact_and_monotone(spark):
    """The module's weight table is the exact quantized 0.8^d series:
    strictly decreasing, w[0] = 1, and each entry equals the
    Decimal-quantized power (no float pow anywhere)."""
    from formula1_etl_analytics_project_spark.plans.catalog_r26 import (
        _EMA_W,
    )

    assert len(_EMA_W) == 20
    assert _EMA_W[0] == "1.000000"
    vals = [Decimal(w) for w in _EMA_W]
    assert all(a > b for a, b in zip(vals, vals[1:]))
    for d, v in enumerate(vals):
        assert v == (Decimal(8) ** d / Decimal(10) ** d).quantize(
            Decimal("0.000001")
        )
