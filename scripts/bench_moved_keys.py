"""Measure the partitioned-upsert moved-key check: exact full-scan vs
Bloom-index probe (VERDICT r03 task 8).

Builds a partitioned orders table from sf0.1 (partition = order year),
then times the same single-partition incoming batch under
check_moved_keys=False / True / "bloom" (best-of-3 after warm-up).
The absolute numbers at sf0.1 are small; what matters is what grows:
the exact check re-scans the full (keys, partition) projection every
merge — O(table) — while the bloom probe reads only the sparse filter
sidecar — O(index << table) — plus a partition-pruned verification
only when a filter fires.

Usage: python scripts/bench_moved_keys.py [--sf=/root/testdata/sf0.1]
Prints one JSON line.
"""

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"
for a in sys.argv[1:]:
    if a.startswith("--sf="):
        SF_DIR = a.split("=", 1)[1]


def main():
    import os

    from pyspark.sql import functions as F

    from formula1_etl_analytics_project_spark.operators import (
        bloom_index as bi,
    )
    from formula1_etl_analytics_project_spark.session import get_spark
    from formula1_etl_analytics_project_spark.sources.readers import (
        read_table,
    )
    from formula1_etl_analytics_project_spark.sources.sinks import (
        upsert_parquet_partitioned,
    )

    spark = get_spark()
    stage = tempfile.mkdtemp(prefix="bench_moved_keys_")
    path = os.path.join(stage, "orders_part")
    try:
        orders = read_table(spark, SF_DIR, "orders").withColumn(
            "o_year", F.year("o_orderdate")
        )
        orders.write.mode("overwrite").partitionBy("o_year").parquet(path)
        n_rows = spark.read.parquet(path).count()
        n_parts = len(
            spark.read.parquet(path).select("o_year").distinct().collect()
        )
        keys_per_part = n_rows // n_parts
        bi.build_key_bloom_index(
            spark, path, ["o_orderkey"], "o_year",
            expected_keys_per_partition=keys_per_part * 2, fpp=0.001,
        )
        # single-partition batch: updates + inserts into the max year
        max_year = spark.read.parquet(path).agg(
            F.max("o_year")
        ).collect()[0][0]
        batch = (
            spark.read.parquet(path)
            .filter(F.col("o_year") == max_year)
            .limit(2000)
            .withColumn("o_orderpriority", F.lit("updated"))
        ).unionByName(
            spark.read.parquet(path)
            .filter(F.col("o_year") == max_year)
            .limit(500)
            .withColumn("o_orderkey", F.col("o_orderkey") + 100_000_000)
        )
        batch = batch.localCheckpoint()

        def run(mode):
            best = float("inf")
            for _ in range(3):
                t0 = time.monotonic()
                upsert_parquet_partitioned(
                    spark, batch, path,
                    keys=["o_orderkey"], partition_col="o_year",
                    order_col=None, check_moved_keys=mode,
                )
                best = min(best, time.monotonic() - t0)
            return round(best, 3)

        run(False)  # warm-up (JIT, page cache)
        out = {
            "sf_dir": SF_DIR,
            "rows": n_rows,
            "partitions": n_parts,
            "batch_rows": batch.count(),
            "upsert_no_check_s": run(False),
            "upsert_exact_check_s": run(True),
            "upsert_bloom_check_s": run("bloom"),
        }
        out["exact_check_overhead_s"] = round(
            out["upsert_exact_check_s"] - out["upsert_no_check_s"], 3
        )
        out["bloom_check_overhead_s"] = round(
            out["upsert_bloom_check_s"] - out["upsert_no_check_s"], 3
        )
        print(json.dumps(out))
    finally:
        shutil.rmtree(stage, ignore_errors=True)


if __name__ == "__main__":
    main()
