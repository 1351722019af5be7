"""Semantics assertions for the curation waterfall: stages are
monotone subsets, stage 2/4 agree with the base operators, and the
corpus text is read through one checkpointed pass.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from formula1_etl_analytics_project_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def test_waterfall_monotone_and_anchored(spark):
    """Four stages; docs and tokens nonincreasing; stage 1 is the
    whole corpus with frac 1.0; every frac equals the exact integer
    division."""
    rows = CATALOG["curation_waterfall"].spark(spark, SF).collect()
    assert [r["stage"] for r in rows] == [1, 2, 3, 4]
    assert rows[0]["n_docs"] == 500
    assert rows[0]["frac_of_raw"] == 1.0
    for a, b in zip(rows, rows[1:]):
        assert b["n_docs"] <= a["n_docs"]
        assert b["n_tokens"] <= a["n_tokens"]
    raw = rows[0]["n_tokens"]
    for r in rows:
        assert r["frac_of_raw"] == r["n_tokens"] / raw
    # sf0.001 has no EXACT duplicates (those appear at larger SFs -
    # parity covers them at sf0.1); the near-dup and quality stages
    # must still remove docs here
    assert rows[3]["n_docs"] < rows[0]["n_docs"]


def test_waterfall_stages_match_base_operators(spark):
    """Stage 2 count equals exact_dedup_docs' fingerprint count;
    stage 3 equals exact keepers intersected with dedup_clusters
    keepers - the waterfall reuses, not reimplements, the operators."""
    rows = {
        r["stage"]: r
        for r in CATALOG["curation_waterfall"].spark(spark, SF).collect()
    }
    n_fp = CATALOG["exact_dedup_docs"].spark(spark, SF).count()
    assert rows[2]["n_docs"] == n_fp
    exact = {
        r["keeper_doc_id"]
        for r in CATALOG["exact_dedup_docs"].spark(spark, SF).collect()
    }
    keepers = {
        r["doc_id"]
        for r in CATALOG["dedup_clusters"]
        .spark(spark, SF)
        .filter(F.col("is_keeper") == 1)
        .collect()
    }
    assert rows[3]["n_docs"] == len(exact & keepers)
