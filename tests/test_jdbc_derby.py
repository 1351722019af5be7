"""End-to-end JDBC sink test against embedded Derby (the in-JVM
database Spark already ships for its Hive metastore) - closing the
S4/S5 coverage gap that was previously construction-only: the batch
write EXECUTES, commits, and round-trips through a real JDBC driver.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from formula1_etl_analytics_project_spark.sources.sinks import write_jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    d = tmp_path_factory.mktemp("derby")
    return f"jdbc:derby:{d}/testdb;create=true"


def test_jdbc_batch_write_roundtrips(spark, derby_url):
    df = spark.range(1_000).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        F.concat(F.lit("row_"), F.col("id").cast("string")).alias("tag"),
    )
    write_jdbc(
        df,
        derby_url,
        table="orders_sink",
        mode="overwrite",
        batch_size=128,
        num_partitions=4,
        properties={"driver": DRIVER},
        # Derby maps StringType -> CLOB by default, which it cannot
        # compare in predicates; VARCHAR keeps the column filterable
        create_table_column_types="tag VARCHAR(64)",
    )
    back = spark.read.jdbc(
        url=derby_url, table="orders_sink", properties={"driver": DRIVER}
    )
    assert back.count() == 1_000
    got = back.agg(F.sum("k"), F.sum("v")).collect()[0]
    assert got[0] == 999 * 1000 // 2
    assert got[1] == 999 * 1000
    assert back.filter(F.col("tag") == "row_7").count() == 1


def test_jdbc_append_accumulates(spark, derby_url):
    df = spark.range(10).select(F.col("id").alias("k"))
    write_jdbc(df, derby_url, "append_sink", mode="overwrite",
               properties={"driver": DRIVER})
    write_jdbc(df, derby_url, "append_sink", mode="append",
               properties={"driver": DRIVER})
    back = spark.read.jdbc(
        url=derby_url, table="append_sink", properties={"driver": DRIVER}
    )
    assert back.count() == 20
