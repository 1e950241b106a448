"""exact_quantiles_refined — the 100 TB-safe exact-quantile path.

Must agree bit-for-bit with Spark's exact ``percentile`` (and therefore with
pandas quantile / DuckDB quantile_cont) on every shape: ties, all-null,
2-row interpolation, integer columns, multiple columns batched."""

import pytest
from pyspark.sql import functions as F

from analyst_toolkit_spark.functions.stats import exact_quantiles_refined


@pytest.fixture(scope="module")
def lineitem(spark, oracle_sf_dir):
    from analyst_toolkit_spark.ingest import load_table

    return load_table(spark, oracle_sf_dir, "lineitem")


def test_matches_builtin_exact(lineitem):
    ps = [0.25, 0.5, 0.75]
    refined = exact_quantiles_refined(
        lineitem, {"l_extendedprice": ps, "l_quantity": ps, "l_discount": [0.5]}
    )
    builtin = lineitem.agg(
        F.percentile(F.col("l_extendedprice"), F.array(*[F.lit(p) for p in ps])).alias("a"),
        F.percentile(F.col("l_quantity"), F.array(*[F.lit(p) for p in ps])).alias("b"),
        F.percentile(F.col("l_discount"), F.lit(0.5)).alias("c"),
    ).first()
    assert refined["l_extendedprice"] == pytest.approx(list(builtin["a"]), abs=1e-9)
    assert refined["l_quantity"] == pytest.approx(list(builtin["b"]), abs=1e-9)
    assert refined["l_discount"] == pytest.approx([builtin["c"]], abs=1e-9)


def test_edge_shapes(spark):
    df = spark.createDataFrame(
        [(5.0, None, 1.0), (5.0, None, 2.0)], schema="x double, y double, z double"
    )
    r = exact_quantiles_refined(df, {"x": [0.25, 0.5], "y": [0.5], "z": [0.25, 0.5, 0.75]})
    assert r["x"] == [5.0, 5.0]  # constant (all-tied) column
    assert r["y"] == [None]  # all-null column
    assert r["z"] == [1.25, 1.5, 1.75]  # 2-row linear interpolation


def test_heavy_ties(spark):
    # one value covering 99% of rows: tie-compression keeps the bracket small
    df = spark.range(10_000).select(
        F.when(F.col("id") % 100 == 0, F.col("id").cast("double")).otherwise(F.lit(7.0)).alias("v")
    )
    r = exact_quantiles_refined(df, {"v": [0.25, 0.5, 0.75]})
    expected = df.agg(F.percentile("v", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))).first()[0]
    assert r["v"] == pytest.approx(list(expected), abs=1e-9)


def test_extreme_quantiles(lineitem):
    r = exact_quantiles_refined(lineitem, {"l_extendedprice": [0.0, 1.0]})
    mm = lineitem.agg(F.min("l_extendedprice"), F.max("l_extendedprice")).first()
    assert r["l_extendedprice"] == pytest.approx([float(mm[0]), float(mm[1])], abs=1e-9)
