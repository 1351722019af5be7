"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash -> CORRECTNESS_r{N}.json).

The real engine lives in ``formula1_etl_analytics_project_spark``; this module is the
thin adapter. The catalog (plans/catalog.py) registers one entry per
operator family from SURVEY.md section 2 plus the training-data
extensions (dedup family, similarity search, text analysis).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from formula1_etl_analytics_project_spark.plans import catalog as _catalog

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the star FK multi-join
    with broadcast dimensions feeding a revenue rollup (the reference's
    wide-table reconstruction, SURVEY.md section 1.5, as a query)."""
    return _catalog.CATALOG["star_join_revenue"].spark(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twins; keys omitted here get the weaker
    rows-only check (non-SQL-expressible ops)."""
    return _catalog.oracle_sql()
