"""Mimics the driver's correctness gate: every catalog query with an
oracle runs on Spark AND DuckDB over the same parquet tables, both
results materialize THROUGH PANDAS, and their canonical forms must
match exactly (columns sorted by name, rows sorted, int/float kept
distinct, floats unrounded) — the same comparison the round driver
applies, via formula1_etl_analytics_project_spark.oracle_harness.

Until round 3 this test rounded floats to 9 digits and compared raw
fetchall() tuples — weaker than the driver, which is how 4 HUGEINT
oracle-output bugs and one out-of-pandas-range timestamp sentinel
passed locally but failed the driver (CORRECTNESS_r03.json). See
oracle_harness's module docstring for the full post-mortem.

Runs at sf0.001 for speed; the driver runs the same comparison at
sf0.01 (scripts/check_new.py --sf=... covers that locally).
"""

from __future__ import annotations

import duckdb
import pytest

from formula1_etl_analytics_project_spark import oracle_harness as oh
from formula1_etl_analytics_project_spark.plans.catalog import CATALOG
from formula1_etl_analytics_project_spark.schemas import TESTDATA_TABLES

SF_DIR = "/root/testdata/sf0.001"


def _duck_con():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


ORACLE_SPECS = [s for s in CATALOG.values() if s.oracle]


@pytest.fixture(scope="module")
def duck():
    return _duck_con()


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=lambda s: s.name)
def test_oracle_parity(spark, duck, spec):
    rep = oh.compare_frames(
        oh.spark_df(spec.spark(spark, SF_DIR)),
        oh.duck_df(duck, spec.oracle),
    )
    assert rep["schema_match"], f"{spec.name}: column sets differ: {rep}"
    assert rep["rows_match"], (
        f"{spec.name}: row counts differ "
        f"spark={rep['spark_rows']} oracle={rep['oracle_rows']}"
    )
    assert rep["hash_match"], (
        f"{spec.name}: values differ; first diffs: {rep['first_diffs']}"
    )
