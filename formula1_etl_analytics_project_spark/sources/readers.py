"""Sources: parquet testdata readers and the wide-F1 CSV reader.

Reference behavior being replaced (SURVEY.md section 2.1):
  * S1/S3 - ``pd.read_csv`` with inferred schema, re-parsed ~19x across
    DAGs (``CompleteETL.py:18,51,76,102``). Here: one declared-schema
    scan; callers cache it when fanning out to many sinks.
  * S2 - the ``'\\N'`` null sentinel handled ad hoc per DAG
    (``fpractice_etl.py:17``). Here: the reader's ``nullValue`` option
    decodes it declaratively so Catalyst sees real nulls (null-aware
    filter pushdown keeps working).

Scale notes: parquet scans get column pruning + predicate pushdown from
Catalyst for free; scan parallelism comes from file splits
(maxPartitionBytes), so nothing here limits a 1000-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from formula1_etl_analytics_project_spark.schemas import (
    TESTDATA_TABLES,
    WIDE_F1_SCHEMA,
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def read_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Read one driver testdata table.

    ``events.ts`` has shipped in two physical flavors across driver
    rounds, and the engine normalizes BOTH to a session-UTC TIMESTAMP
    so every downstream expression (``unix_micros``, casts to long,
    range frames) sees one type:

    * TIMESTAMP(NANOS): Spark surfaces it as a raw long under
      ``spark.sql.legacy.parquet.nanosAsLong``; convert with integer
      division (``div 1000``) - floating-point division at 1e18
      nanoseconds loses microsecond precision - matching DuckDB's
      truncating nanos->micros read bit-for-bit.
    * TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads
      TIMESTAMP_NTZ; cast to TIMESTAMP, which under the engine's
      pinned-UTC session interprets the wall-clock value as UTC -
      exactly how DuckDB reads the same naive micros.

    ``spread=True`` repartitions a scan that has fewer splits than the
    cluster has cores. Use it for compute-heavy per-row work (shingling,
    vector math) over small single-file inputs: a one-row-group parquet
    file yields ONE scan task, serializing the expensive map. At real
    scale the corpus is many files and the scan parallelizes for free -
    this only compensates for testdata file layout.
    """
    if name == "events":
        # Defensive: the harness may hand us a session built without
        # session.get_spark. The conf is runtime-settable; without it a
        # bare read of the TIMESTAMP(NANOS) file throws
        # PARQUET_TYPE_ILLEGAL before our ts conversion can run.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            # UTC is the engine's declared timezone contract (session.py);
            # date_format over the converted ts renders in session tz.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        except Exception:
            pass
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    if spread:
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
    return df


def load_all(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR
) -> dict[str, DataFrame]:
    return {name: read_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


_REGISTERED_SF: dict[str, str] = {}


def register_views(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, force: bool = False
) -> None:
    """Expose every testdata table as a temp view for the SQL surface
    (SURVEY.md EP3: the reference's only query layer is raw SQL).

    Idempotent per (session, sf_dir): re-registering 10 parquet views
    costs ~1s of file listing/footer reads, so repeat calls for the
    same directory are skipped (the common case - every SQL-surface
    catalog entry calls this defensively)."""
    key = spark.sparkContext.applicationId
    if not force and _REGISTERED_SF.get(key) == sf_dir:
        return
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
    _REGISTERED_SF[key] = sf_dir


def read_wide_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read the wide denormalized F1 CSV (66-column contract,
    SURVEY.md section 1.5) with the ``'\\N'`` sentinel decoded at the
    source and a declared schema (no inference pass).

    ``_row_id`` captures file order: pandas ``drop_duplicates`` keeps
    the first row *in file order* (SURVEY D2 hard part), so downstream
    keep-first dedup needs an explicit tiebreaker column.
    """
    df = spark.read.csv(
        path,
        header=True,
        schema=WIDE_F1_SCHEMA,
        nullValue="\\N",
        mode="PERMISSIVE",
    )
    return df.withColumn("_row_id", F.monotonically_increasing_id())
