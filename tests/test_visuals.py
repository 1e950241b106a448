"""M08 plot-data producer tests."""

import math

import pytest
from pyspark.sql import Row

from analyst_toolkit_spark.operators import visuals as M


@pytest.fixture(scope="module")
def nums(spark):
    return spark.createDataFrame([Row(v=float(x)) for x in range(100)] + [Row(v=None)])


def test_histogram_bins(nums):
    out = M.histogram(nums, "v", bins=10)
    rows = out.collect()
    assert len(rows) == 10
    assert sum(r["count"] for r in rows) == 100  # nulls excluded
    assert rows[0]["lo"] == 0.0 and rows[-1]["hi"] == 99.0
    # max value lands in the last bin (closed upper edge)
    assert rows[-1]["count"] == 10


def test_histogram_degenerate(spark):
    df = spark.createDataFrame([Row(v=5.0), Row(v=5.0)])
    rows = M.histogram(df, "v", bins=4).collect()
    assert sum(r["count"] for r in rows) == 2
    empty = M.histogram(spark.createDataFrame([], "v double"), "v")
    assert empty.count() == 0


def test_boxplot_stats(nums):
    r = M.boxplot_stats(nums, ["v"]).collect()[0]
    assert r["min"] == 0.0 and r["max"] == 99.0
    assert r["q1"] == 24.75 and r["median"] == 49.5 and r["q3"] == 74.25
    assert r["n_outliers"] == 0
    assert r["lo_whisker"] == 0.0 and r["hi_whisker"] == 99.0


def test_boxplot_outlier_count(spark):
    df = spark.createDataFrame([Row(v=float(x)) for x in range(20)] + [Row(v=1000.0)])
    r = M.boxplot_stats(df, ["v"]).collect()[0]
    assert r["n_outliers"] == 1
    assert r["hi_whisker"] == 19.0  # most extreme point inside the fence


def test_kde_grid_integrates_to_one(nums):
    rows = M.kde_grid(nums, "v", grid_points=200).collect()
    xs = [r["x"] for r in rows]
    dens = [r["density"] for r in rows]
    dx = xs[1] - xs[0]
    area = sum(d * dx for d in dens)
    assert math.isclose(area, 1.0, rel_tol=0.05)
    assert max(dens) > 0


def test_dtype_composition(spark):
    df = spark.createDataFrame([Row(a=1, b="x", c="y", d=2.0)])
    out = {r["dtype"]: r["n_columns"] for r in M.dtype_composition(df).collect()}
    assert out == {"bigint": 1, "string": 2, "double": 1}


def test_top_categories(spark):
    df = spark.createDataFrame([Row(c=v) for v in ["a"] * 5 + ["b"] * 3 + ["c"] * 3 + [None]])
    rows = M.top_categories(df, "c", top_n=2).collect()
    assert [(r["value"], r["count"]) for r in rows] == [("a", 5), ("b", 3)]
