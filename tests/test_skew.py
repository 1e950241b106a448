"""Skew utility tests: salted holistic aggs and hot-key split joins must be
result-identical to their naive forms."""

import pytest
from pyspark.sql import Row, functions as F

from analyst_toolkit_spark.functions.skew import hot_keys, salted_agg, skew_split_join


@pytest.fixture(scope="module")
def skewed(spark):
    # key 0 holds 90% of rows
    rows = [Row(k=0, v=i) for i in range(900)] + [Row(k=1 + i % 10, v=i) for i in range(100)]
    return spark.createDataFrame(rows)


def test_salted_agg_matches_naive(skewed):
    naive = {
        r["k"]: sorted(r["vals"])
        for r in skewed.groupBy("k").agg(F.collect_list("v").alias("vals")).collect()
    }
    salted = {
        r["k"]: sorted(r["vals"])
        for r in salted_agg(
            skewed, ["k"],
            {"vals": F.collect_list("v")},
            {"vals": F.flatten(F.collect_list("vals"))},
        ).collect()
    }
    assert salted == naive


def test_hot_keys_detects_dominant(skewed):
    hot = hot_keys(skewed, "k", threshold_fraction=0.5, sample_fraction=1.0)
    assert hot == [0]


@pytest.mark.parametrize("how", ["inner", "left"])
def test_skew_split_join_matches_naive(spark, skewed, how):
    right = spark.createDataFrame([Row(k=i, name=f"n{i}") for i in range(8)])
    naive = skewed.join(right, "k", how).groupBy("k", "name").agg(F.count(F.lit(1)).alias("n"))
    split = skew_split_join(skewed, right, "k", how, hot=[0]).groupBy("k", "name").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, split.collect()))


def test_split_join_rejects_right(spark, skewed):
    with pytest.raises(ValueError):
        skew_split_join(skewed, skewed, "k", "right")
