"""Grouped-map (applyInPandas) operator tests."""

from __future__ import annotations

import math

import pytest

from formula1_etl_analytics_project_spark.operators.grouped import interpolate_gaps


@pytest.fixture(scope="module")
def series(spark):
    rows = [
        # group A: interior gap 10 -> 30 fills to 20
        ("a", 1, 10.0),
        ("a", 2, None),
        ("a", 3, 30.0),
        # group A continued: two-step gap 30 -> 90 fills 50, 70
        ("a", 4, None),
        ("a", 5, None),
        ("a", 6, 90.0),
        # group B: leading + trailing nulls stay null
        ("b", 1, None),
        ("b", 2, 5.0),
        ("b", 3, None),
    ]
    return spark.createDataFrame(rows, "k string, t int, v double")


def test_interior_gaps_fill_linearly(spark, series):
    out = {
        (r["k"], r["t"]): r["v"]
        for r in interpolate_gaps(series, "k", "t", "v").collect()
    }
    assert out[("a", 2)] == 20.0
    assert out[("a", 4)] == 50.0
    assert out[("a", 5)] == 70.0
    # known values untouched
    assert out[("a", 1)] == 10.0 and out[("a", 6)] == 90.0


def test_edge_nulls_stay_null(spark, series):
    out = {
        (r["k"], r["t"]): r["v"]
        for r in interpolate_gaps(series, "k", "t", "v").collect()
    }
    assert out[("b", 1)] is None  # leading: no left anchor
    assert out[("b", 3)] is None  # trailing: no right anchor
    assert out[("b", 2)] == 5.0


def test_groups_are_independent(spark, series):
    """Group b's values must not anchor group a's interpolation."""
    out = interpolate_gaps(series, "k", "t", "v").collect()
    a_vals = [r["v"] for r in out if r["k"] == "a"]
    assert all(v is not None and not math.isnan(v) for v in a_vals)


def test_rejects_non_float_value(spark, series):
    with pytest.raises(TypeError):
        interpolate_gaps(series.select("k", "t", series["t"].alias("v")), "k", "t", "v")
