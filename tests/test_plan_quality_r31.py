"""Plan and semantics assertions for the round-31 entries: DiD is one
pushed-filter scan with 4-row post-exchange work, and the anomaly
detector's residual table is checkpointed so sigma and the flag
filter share one fact pass.
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


def test_did_one_scan_pushed_filter(spark):
    """One events scan with the event_type predicate pushed to
    parquet; the moment aggregate combines map-side; no joins."""
    plan = _plan(spark, "diff_in_diff")
    assert plan.count("Scan parquet") == 2  # tree line + detail header
    pushed = " ".join(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "purchase" in pushed or "EqualTo(event_type" in pushed
    assert "partial_sum" in plan
    assert "Join" not in plan


def test_did_matches_pandas_cells(spark):
    """Recompute the four cell means and the DiD estimate in pandas
    with the same md5 split and cutover; estimates agree to 1e-9 and
    t = did/se."""
    import hashlib

    import pandas as pd

    row = CATALOG["diff_in_diff"].spark(spark, SF).collect()[0]
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["event_type"] == "purchase"].copy()
    ev["grp"] = ev["user_id"].map(
        lambda u: "treat"
        if int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2 == 1
        else "control"
    )
    ev["period"] = (
        ev["ts"] >= pd.Timestamp("2024-01-16")
    ).map({True: "post", False: "pre"})
    m = ev.groupby(["grp", "period"])["value"].mean()
    did = (m["treat", "post"] - m["treat", "pre"]) - (
        m["control", "post"] - m["control", "pre"]
    )
    assert abs(row["did"] - did) < 1e-9
    assert row["n_events"] == len(ev)
    assert abs(row["t_stat"] - row["did"] / row["se"]) < 1e-12
    assert row["se"] > 0


def test_anomaly_resid_checkpointed_single_pass(spark):
    """The residual table must be a checkpoint (ExistingRDD) read by
    both sigma and the flag filter - no second events scan in the
    final plan."""
    plan = _plan(spark, "seasonal_anomaly_flags")
    assert "Scan parquet" not in plan
    assert plan.count("Scan ExistingRDD") >= 2


def test_anomaly_flags_are_true_3sigma_outliers(spark):
    """Every flagged hour's |z| > 3; recomputing the hour-of-day
    adjustment in pandas reproduces the flagged set exactly."""
    import pandas as pd

    rows = CATALOG["seasonal_anomaly_flags"].spark(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert abs(r["z"]) > 3
        assert abs(r["residual"] - (r["total"] - r["expected"])) < 1e-9

    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["hr"] = pd.to_datetime(ev["ts"]).dt.floor("h")
    hourly = ev.groupby("hr")["value"].sum().reset_index()
    hourly["hod"] = hourly["hr"].dt.hour
    hourly["mu"] = hourly.groupby("hod")["value"].transform("mean")
    hourly["r"] = hourly["value"] - hourly["mu"]
    sd = math.sqrt(
        (hourly["r"].map(lambda x: round(x * x, 6))).sum()
        / (len(hourly) - 1)
    )
    want = set(hourly[hourly["r"].abs() > 3 * sd]["hr"])
    got = {pd.Timestamp(r["hr"]) for r in rows}
    assert got == want
