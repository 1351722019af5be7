"""Custom Python DataSource tests: determinism, partitioned reads,
schema contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from formula1_etl_analytics_project_spark.sources.pysource import SyntheticEventsDataSource


@pytest.fixture(scope="module", autouse=True)
def registered(spark):
    spark.dataSource.register(SyntheticEventsDataSource)


def _read(spark, **opts):
    r = spark.read.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_row_count_and_schema(spark):
    df = _read(spark, rows=500, partitions=4)
    assert df.count() == 500
    assert [f.name for f in df.schema.fields] == [
        "event_id", "user_id", "event_type", "ts", "value",
    ]
    assert df.select("event_id").distinct().count() == 500


def test_partitioned_read(spark):
    df = _read(spark, rows=1000, partitions=5)
    assert df.rdd.getNumPartitions() == 5


def test_deterministic_across_layouts(spark):
    """Same (seed, rows) must yield identical content regardless of
    partition count - the replayability contract."""
    a = sorted(map(tuple, _read(spark, rows=300, partitions=3).collect()))
    b = sorted(map(tuple, _read(spark, rows=300, partitions=7).collect()))
    assert a == b


def test_composes_with_engine_ops(spark):
    """The custom source is a first-class scan: aggregations and joins
    run over it like any table."""
    df = _read(spark, rows=400, partitions=4)
    agg = df.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    assert sum(r["n"] for r in agg) == 400
    assert all(r["n"] > 0 for r in agg)


def test_streaming_source_matches_batch_rows(spark):
    """The streaming form must deliver EXACTLY the batch source's rows
    (same (seed, i) function, same schema) once drained - the
    replayability property Structured Streaming's exactly-once rests
    on - across several micro-batches (batch_rows < max_rows)."""
    from formula1_etl_analytics_project_spark.sources.pysource import (
        SyntheticEventsDataSource,
        SyntheticEventsStreamDataSource,
    )

    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(SyntheticEventsStreamDataSource)

    q = (
        spark.readStream.format("synthetic_events_stream")
        .option("max_rows", 100)
        .option("batch_rows", 37)
        .load()
        .writeStream.format("memory")
        .queryName("pystream")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM pystream").collect()
    )
    expected = sorted(
        tuple(r)
        for r in spark.read.format("synthetic_events")
        .option("rows", 100)
        .load()
        .collect()
    )
    assert got == expected
    assert len(got) == 100
