"""Measure per-query shuffle and scan volume at sf0.1.

For each headline bench query, runs it once warm and diffs the Spark
UI REST totals (input bytes, shuffle read/write bytes) before and
after — the quantitative side of SCALING.md's 100 TB arguments: a
query whose shuffle volume ~= its input volume re-exchanges the whole
fact table; one whose shuffle is orders of magnitude below input is
dominated by map-side work and broadcasts, and survives a 1000x
scale-up on scan bandwidth alone.

Usage: python scripts/measure_shuffle.py [--sf=DIR] [--only=a,b,c]
Prints one markdown table row per query.
"""

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"
ONLY = None
ALL = False  # --all: sweep the whole catalog, not just the bench set
for a in sys.argv[1:]:
    if a.startswith("--sf="):
        SF_DIR = a.split("=", 1)[1]
    if a.startswith("--only="):
        ONLY = set(a.split("=", 1)[1].split(","))
    if a == "--all":
        ALL = True


def _stage_totals_once(ui: str, app: str) -> dict:
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
    stages = None
    for attempt in range(5):
        try:
            with urllib.request.urlopen(url, timeout=30) as r:
                stages = json.load(r)
            break
        except OSError:
            # UI store slow under load - retry, don't kill the sweep
            if attempt == 4:
                raise
            time.sleep(2.0)
    tot = {"input": 0, "sh_read": 0, "sh_write": 0, "n_stages": len(stages)}
    for s in stages:
        tot["input"] += s.get("inputBytes", 0)
        tot["sh_read"] += s.get("shuffleReadBytes", 0)
        tot["sh_write"] += s.get("shuffleWriteBytes", 0)
    return tot


def _stage_totals(ui: str, app: str) -> dict:
    """Poll until two consecutive reads agree (stages publish their
    metrics to the UI store asynchronously - a fixed post-query sleep
    can read a stage's totals before they land and attribute its
    bytes to the NEXT query). Bounded at ~5 s so a hung store cannot
    stall the sweep."""
    prev = _stage_totals_once(ui, app)
    for _ in range(25):
        time.sleep(0.2)
        cur = _stage_totals_once(ui, app)
        if cur == prev:
            return cur
        prev = cur
    return prev


def _fmt(b: float) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if b < 1024 or unit == "GiB":
            return f"{b:.1f} {unit}"
        b /= 1024
    return f"{b:.1f} GiB"


def main() -> None:
    from formula1_etl_analytics_project_spark.plans.catalog import (
        CATALOG,
        bench_queries,
    )
    from formula1_etl_analytics_project_spark.session import get_spark

    # the engine session disables the UI; this measurement needs its
    # REST metrics, so turn it on for this process only
    # retainedStages must exceed the sweep's total stage count: the
    # UI store evicts old stages past the default 1000, which makes
    # the before/after diffs NEGATIVE once a long --all sweep passes
    # the threshold (caught in round 6: 33 corrupted rows).
    spark = get_spark(
        app_name="shuffle-measure",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "300000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    if ui is None:
        raise SystemExit(
            "Spark UI still disabled (session pre-existed?); run this "
            "script in a fresh process"
        )

    queries = (
        {n: s.spark for n, s in CATALOG.items()} if ALL else bench_queries()
    )
    print("| query | sec | input | shuffle write | shuffle/input |")
    print("|---|---|---|---|---|")
    for name, fn in queries.items():
        if ONLY and name not in ONLY:
            continue
        try:
            fn(spark, SF_DIR).count()  # warm: JIT + page cache
            spark.catalog.clearCache()
            before = _stage_totals(ui, app)
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            dt = time.perf_counter() - t0
            after = _stage_totals(ui, app)
        except Exception as ex:  # noqa: BLE001 - isolate, keep sweeping
            print(f"| {name} | ERR | {str(ex)[:60]} | | |")
            continue
        inp = after["input"] - before["input"]
        shw = after["sh_write"] - before["sh_write"]
        ratio = (shw / inp) if inp else float("nan")
        print(
            f"| {name} | {dt:.2f} | {_fmt(inp)} | {_fmt(shw)} "
            f"| {ratio:.2f} |"
        )


if __name__ == "__main__":
    main()
