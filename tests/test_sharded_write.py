"""Tests for the training-shard writer (sources/sinks.py
write_sharded): file-size caps and globally-ordered disjoint key
ranges - the properties a sequential data loader depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from formula1_etl_analytics_project_spark.sources.sinks import write_sharded


def test_sharded_write_caps_files_and_orders_ranges(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("shards"))
    df = spark.range(10_000).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("k")
    )
    write_sharded(df, path, order_col="k", rows_per_file=1_000, num_shards=4)

    back = spark.read.parquet(path).select(
        "id", "k", F.input_file_name().alias("f")
    )
    assert back.count() == 10_000
    per_file = (
        back.groupBy("f")
        .agg(F.count("*").alias("n"), F.min("k").alias("lo"), F.max("k").alias("hi"))
        .collect()
    )
    # every file respects the record cap
    assert all(r["n"] <= 1_000 for r in per_file)
    assert len(per_file) >= 10  # 10k rows / 1k cap
    # per-file key ranges are disjoint when sorted - the global order
    ranges = sorted((r["lo"], r["hi"]) for r in per_file)
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "file key ranges must not overlap"


def test_sharded_write_roundtrips_content(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("shards_rt"))
    df = spark.range(500).select("id", (F.col("id") % 7).alias("g"))
    write_sharded(df, path, order_col=["g", "id"], rows_per_file=100)
    back = spark.read.parquet(path)
    assert back.count() == 500
    assert back.select(F.sum("id")).collect()[0][0] == 500 * 499 // 2
