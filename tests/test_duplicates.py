import pytest
from pyspark.sql import functions as F

from analyst_toolkit_spark.ingest import load_table, with_row_id
from analyst_toolkit_spark.operators.duplicates import (
    drop_duplicates_keep_order,
    duplicate_clusters,
    flag_duplicates,
)
from tests.oracle import compare, duckdb_con


@pytest.fixture(scope="module")
def con(oracle_sf_dir):
    return duckdb_con(oracle_sf_dir)


def test_keep_order_semantics(spark):
    # mirrors FIXTURES.md 1.3: keep='first'/'last' must respect ingest order
    rows = [("a", "x", 1.0), ("a", "x", 2.0), ("b", "y", 3.0), ("a", "x", 4.0)]
    df = with_row_id(spark.createDataFrame(rows, ["k1", "k2", "payload"]))

    first = drop_duplicates_keep_order(df, ["k1", "k2"], keep="first")
    kept = {r["payload"] for r in first.collect()}
    assert kept == {1.0, 3.0}

    last = drop_duplicates_keep_order(df, ["k1", "k2"], keep="last")
    kept = {r["payload"] for r in last.collect()}
    assert kept == {4.0, 3.0}

    flags = flag_duplicates(df, ["k1", "k2"], keep=False).orderBy("_row_id").collect()
    assert [r["is_duplicate"] for r in flags] == [True, True, False, True]

    flags_first = flag_duplicates(df, ["k1", "k2"], keep="first").orderBy("_row_id").collect()
    assert [r["is_duplicate"] for r in flags_first] == [False, True, False, True]


def test_flag_duplicates_oracle(spark, oracle_sf_dir, con):
    df = load_table(spark, oracle_sf_dir, "lineitem")
    out = (
        flag_duplicates(df, ["l_orderkey", "l_partkey"], keep=False)
        .filter("is_duplicate")
        .select("l_orderkey", "l_partkey", "l_linenumber")
    )
    sql = """
      SELECT l_orderkey, l_partkey, l_linenumber FROM lineitem
      QUALIFY count(*) OVER (PARTITION BY l_orderkey, l_partkey) > 1
    """
    compare(out, con, sql, "flag_dupes")


def test_keep_first_deterministic_oracle(spark, oracle_sf_dir, con):
    # cross-engine keep-first needs an explicit deterministic order key
    df = load_table(spark, oracle_sf_dir, "lineitem")
    out = drop_duplicates_keep_order(
        df,
        ["l_orderkey", "l_partkey"],
        keep="first",
        order_by=["l_linenumber", "l_quantity", "l_extendedprice"],
    ).select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")
    sql = """
      SELECT l_orderkey, l_partkey, l_linenumber, l_quantity FROM lineitem
      QUALIFY row_number() OVER (PARTITION BY l_orderkey, l_partkey
                                 ORDER BY l_linenumber, l_quantity, l_extendedprice) = 1
    """
    compare(out, con, sql, "keep_first")


def test_clusters_oracle(spark, oracle_sf_dir, con):
    df = load_table(spark, oracle_sf_dir, "lineitem")
    out = duplicate_clusters(df, ["l_orderkey", "l_partkey"])
    sql = """
      SELECT l_orderkey, l_partkey, count(*) AS cluster_size FROM lineitem
      GROUP BY 1, 2 HAVING count(*) >= 2
    """
    compare(out, con, sql, "clusters")
