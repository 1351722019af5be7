"""Plan and semantics assertions for mmr_diversify: the greedy chain
runs as bounded TakeOrdered argmaxes over the checkpointed candidate
list (no driver loop, no corpus-scale sequential stage), and the
selection matches an independent greedy recomputation.
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


def test_mmr_argmaxes_are_takeordered_over_checkpoints(spark):
    """Each greedy step is a TakeOrderedAndProject over the bounded
    candidate set; the candidate list and similarity matrix are
    checkpointed (ExistingRDD scans), so no greedy stage re-executes
    the BM25 scoring or the corpus scan."""
    plan = _plan(spark, "mmr_diversify")
    assert "TakeOrderedAndProject" in plan
    assert "Scan ExistingRDD" in plan
    assert "Scan parquet" not in plan


def test_mmr_matches_independent_greedy(spark):
    """Recompute the greedy MMR in plain Python from the BM25 top-10
    and exact token-set jaccards; the 3 picks and their scores must
    match."""
    rows = CATALOG["mmr_diversify"].spark(spark, SF).collect()
    assert [r["pick"] for r in rows] == [1, 2, 3]

    cand = (
        CATALOG["bm25_doc_scores"]
        .spark(spark, SF)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(10)
        .collect()
    )
    rel = {r["doc_id"]: r["bm25"] for r in cand}
    toks = {
        r["doc_id"]: set(
            str(r["text"]).split()
        )
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id").isin(*rel.keys()))
        .collect()
    }

    def jac_exact(a, b):
        i = len(toks[a] & toks[b])
        u = len(toks[a]) + len(toks[b]) - i
        return i / u if u else 0.0

    lam = 0.7
    selected = []
    got = {r["pick"]: r for r in rows}
    remaining = set(rel)
    for pick in (1, 2, 3):
        best = None
        for d in sorted(remaining):
            pen = max((jac_exact(d, s) for s in selected), default=0.0)
            score = lam * rel[d] - (0.3 * pen if selected else 0.0)
            if best is None or score > best[1]:
                best = (d, score)
        d, score = best
        assert got[pick]["doc_id"] == d
        assert abs(got[pick]["mmr"] - score) < 1e-9
        selected.append(d)
        remaining.discard(d)


def test_mmr_picks_are_distinct_and_first_is_top_bm25(spark):
    """The 3 picks are distinct; pick 1 is the BM25 argmax (no
    diversity penalty yet); later picks never beat pick 1's raw
    relevance after the penalty."""
    rows = CATALOG["mmr_diversify"].spark(spark, SF).collect()
    ids = [r["doc_id"] for r in rows]
    assert len(set(ids)) == 3
    top = (
        CATALOG["bm25_doc_scores"]
        .spark(spark, SF)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(1)
        .collect()[0]["doc_id"]
    )
    assert ids[0] == top
