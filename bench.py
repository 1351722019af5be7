"""Benchmark harness: runs the headline catalog queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <sf>}

Each query is timed end-to-end (plan build -> execution -> driver-side
materialization via a count/collect of the final small result). One
untimed warm-up run per query absorbs JVM JIT / codegen compilation
(measured at 5-10s of one-time cost on first evaluation of a complex
expression), then the best of three timed runs is reported -
steady-state throughput, which is what matters at scale.

Variance note (measured round 3): the container's multi-core timing is
noisy - an identical query re-run in one warm process spans 1.6-2.3s,
and a fixed all-core workload occasionally takes 5-10x its usual
wall-clock with zero GC activity and no competing processes (event-log
task times show ALL tasks uniformly slower, pointing at host-level CPU
contention). Best-of-3 bounds but does not eliminate this; treat
round-over-round per-query deltas under ~2x as within noise, and
compare plan shapes (tests/test_plan_quality.py) rather than
single-digit-percent timings.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from formula1_etl_analytics_project_spark.plans.catalog import CATALOG, bench_queries
from formula1_etl_analytics_project_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def _run_once(spark, fn) -> tuple[float, int]:
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    n = fn(spark, SF_DIR).count()
    return time.perf_counter() - t0, n


def main() -> None:
    spark = get_spark(app_name="formula1-etl-analytics-spark-bench")

    timings: dict[str, float] = {}
    for name, fn in bench_queries().items():
        # two warm-ups: queries heavy in interpreted higher-order
        # lambdas need ~3 evaluations before JIT/codegen reach steady
        # state (measured on prefix_jaccard_pairs: 3.9 -> 2.8 -> 1.8s
        # over consecutive runs; one warm-up let a mid-warm-in number
        # into BENCH_r04 as a phantom +62% regression)
        _run_once(spark, fn)
        _run_once(spark, fn)
        # best-of-3: the recorded number is steady-state throughput,
        # not whatever co-tenant load happened to coincide with a run
        best, n = min(_run_once(spark, fn) for _ in range(3))
        timings[name] = round(best, 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
