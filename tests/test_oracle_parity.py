"""Mimics the driver's correctness gate: every catalog query with an
oracle runs on Spark AND DuckDB over the same parquet tables, and the
results must match exactly after order-insensitive normalization
(columns sorted by name, rows sorted by all values).

Runs at sf0.001 for speed; the driver runs the same comparison at
sf0.01.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest

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


def _norm_cell(v):
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # canonical float formatting: collapses -0.0/0.0, fixed repr
        return repr(round(v, 9))
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    ncols = [cols[i] for i in order]
    nrows = sorted(
        tuple(_norm_cell(r[i]) for i in order) for r in rows
    )
    return ncols, nrows


ORACLE_SPECS = [s for s in CATALOG.values() if s.oracle]


@pytest.fixture(scope="module")
def duck():
    return _duck_con()


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=lambda s: s.name)
def test_oracle_parity(spark, duck, spec):
    sdf = spec.spark(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(spec.oracle)
    dcols = [d[0] for d in res.description]
    drows = [tuple(r) for r in res.fetchall()]

    assert sorted(scols) == sorted(dcols), (
        f"{spec.name}: column names differ: spark={scols} duck={dcols}"
    )
    ncols, nsrows = _normalize(scols, srows)
    _, ndrows = _normalize(dcols, drows)
    assert len(nsrows) == len(ndrows), (
        f"{spec.name}: row count spark={len(nsrows)} duck={len(ndrows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(nsrows, ndrows) if a != b
    ][:5]
    assert not mismatches, f"{spec.name}: first diffs {mismatches}"
