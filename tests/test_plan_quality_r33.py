"""Plan and semantics assertions for the round-33 entries: ANOVA is
one pruned pass whose F matches an independent decomposition, and
the source-similarity pair join runs over the histogram, not the
document table.
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


def test_anova_one_pruned_pass(spark):
    """One orders scan reading exactly (o_orderdate, o_totalprice);
    the group moments combine map-side; no joins anywhere."""
    plan = _plan(spark, "anova_dow_value")
    assert plan.count("Scan parquet") == 2  # tree line + detail header
    schema = " ".join(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "o_orderdate" in schema and "o_totalprice" in schema
    assert "o_custkey" not in schema
    assert "partial_sum" in plan
    assert "Join" not in plan


def test_anova_matches_pandas_decomposition(spark):
    """Recompute MS_between / MS_within in pandas via the group-mean
    decomposition (different algebraic route than the moment form);
    F agrees to 1e-6 relative."""
    import pandas as pd

    row = CATALOG["anova_dow_value"].spark(spark, SF).collect()[0]
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["dow"] = pd.to_datetime(o["o_orderdate"]).dt.dayofweek
    g = o.groupby("dow")["o_totalprice"]
    n, k = len(o), g.ngroups
    grand = o["o_totalprice"].mean()
    ssb = sum(len(v) * (v.mean() - grand) ** 2 for _, v in g)
    ssw = sum(((v - v.mean()) ** 2).sum() for _, v in g)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row["k"] == k and row["n_total"] == n
    assert abs(row["f_stat"] - f) / f < 1e-6
    assert row["ms_between"] > 0 and row["ms_within"] > 0


def test_source_sim_pair_join_runs_on_histogram(spark):
    """The token-keyed pair join consumes the checkpointed histogram
    (ExistingRDD), never the raw documents; norms broadcast back."""
    plan = _plan(spark, "source_pair_similarity")
    assert "Scan parquet" not in plan  # histogram is checkpointed
    assert plan.count("Scan ExistingRDD") >= 2
    assert "BroadcastHashJoin" in plan


def test_source_sim_values_and_coverage(spark):
    """All 190 source pairs present (20 choose 2), cosines in (0, 1],
    symmetric ordering (src_a < src_b), and a sampled pair matches a
    brute-force numpy recomputation."""
    import collections

    import numpy as np
    import pandas as pd

    rows = CATALOG["source_pair_similarity"].spark(spark, SF).collect()
    assert len(rows) == 190
    for r in rows:
        assert r["src_a"] < r["src_b"]
        assert 0.0 < r["cos_sim"] <= 1.0 + 1e-12

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    def vec(src):
        c = collections.Counter()
        for t in docs[docs["source"] == src]["text"]:
            c.update(" ".join(str(t).lower().split()).split(" "))
        return c
    a, b = rows[0]["src_a"], rows[0]["src_b"]
    va, vb = vec(a), vec(b)
    dot = sum(va[t] * vb[t] for t in va.keys() & vb.keys())
    na = np.sqrt(sum(v * v for v in va.values()))
    nb = np.sqrt(sum(v * v for v in vb.values()))
    assert abs(rows[0]["cos_sim"] - dot / (na * nb)) < 1e-9
