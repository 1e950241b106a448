"""Bucketed-join plan tests: co-located joins must not shuffle."""

import pytest
from pyspark.sql import functions as F

from analyst_toolkit_spark.ingest import load_table
from analyst_toolkit_spark.sources.bucketing import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    write_bucketed(orders, "b_orders", ["o_custkey"], n_buckets=8, sort_cols=["o_custkey"])
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "b_customer", ["o_custkey"], n_buckets=8,
        sort_cols=["o_custkey"],
    )
    yield "b_orders", "b_customer"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    # disable broadcast so the plan would otherwise need a shuffled SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, ["o_custkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_correct(spark, bucketed_tables, sf_dir):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, ["o_custkey"])
    expected = (
        load_table(spark, sf_dir, "orders")
        .join(load_table(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .count()
    )
    assert joined.count() == expected


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_tables):
    plan = (
        spark.table("b_orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
