import pytest
from pyspark.sql import functions as F

from analyst_toolkit_spark.ingest import load_table
from analyst_toolkit_spark.operators.normalize import (
    apply_fuzzy_correction,
    build_fuzzy_map,
    coerce_numeric,
    parse_datetime,
    remap_values,
    rename_columns,
    standardize_text,
)
from tests.oracle import compare, duckdb_con


@pytest.fixture(scope="module")
def con(oracle_sf_dir):
    return duckdb_con(oracle_sf_dir)


def test_standardize_text(spark):
    df = spark.createDataFrame([("  HeLLo ",), (None,)], ["s"])
    out = standardize_text(df, ["s"]).collect()
    assert out[0]["s"] == "hello" and out[1]["s"] is None


def test_remap_with_null_sentinel(spark):
    df = spark.createDataFrame([("m",), ("f",), ("?",), ("x",)], ["sex"])
    out = remap_values(df, "sex", {"m": "MALE", "f": "FEMALE", "?": "null"})
    vals = [r["sex"] for r in out.collect()]
    assert vals == ["MALE", "FEMALE", None, "x"]


def test_rename(spark):
    df = spark.createDataFrame([(1.0,)], ["bill length (mm)"])
    out = rename_columns(df, {"bill length (mm)": "bill_length_mm", "nope": "x"})
    assert out.columns == ["bill_length_mm"]


def test_fuzzy_correction(spark):
    # penguins-style typo fixture (FIXTURES.md §2)
    df = spark.createDataFrame(
        [("Adelie",), ("Adele",), ("Gentou",), ("Chinstrap",), ("zzz",), (None,)], ["species"]
    )
    master = ["Adelie", "Chinstrap", "Gentoo"]
    corrected, corrections = apply_fuzzy_correction(df, "species", master, cutoff=80.0)
    assert corrections["Adele"] == "Adelie" and corrections["Gentou"] == "Gentoo"
    assert "zzz" not in corrections
    vals = {r["species"] for r in corrected.collect()}
    assert vals == {"Adelie", "Chinstrap", "Gentoo", "zzz", None}


def test_parse_datetime_policies(spark):
    df = spark.createDataFrame([("2020-01-02",), ("02/03/2021",), ("garbage",), (None,)], ["d"])
    out, nat = parse_datetime(df, "d", formats=["yyyy-MM-dd", "MM/dd/yyyy"], errors="coerce")
    parsed = [r["d"] for r in out.orderBy(F.col("d").asc_nulls_last()).collect()]
    assert nat == 1 and parsed[0].year == 2020 and parsed[1].year == 2021

    with pytest.raises(ValueError, match="garbage"):
        parse_datetime(df, "d", formats=["yyyy-MM-dd"], errors="raise")

    out_ign, nat_ign = parse_datetime(df, "d", formats=["yyyy-MM-dd"], errors="ignore")
    assert nat_ign == 0 and dict(out_ign.dtypes)["d"] == "string"  # untouched

    out_naive, _ = parse_datetime(df, "d", formats=["yyyy-MM-dd"], errors="coerce", make_naive=True)
    assert dict(out_naive.dtypes)["d"] == "timestamp_ntz"


def test_parse_datetime_count_is_lazy_and_exact(spark):
    """errors='coerce' must NOT run the accounting agg unless the count is
    read (the r4 eager scan doubled every parse); resolution is exact and
    cached, including after arbitrary caller actions (sorts re-execute
    subtrees, which is why this is a deferred agg and not df.observe)."""
    from analyst_toolkit_spark.operators.normalize import LazyNatCount

    df = spark.createDataFrame([("2020-01-02",), ("garbage",), (None,)], ["d"])
    out, nat = parse_datetime(df, "d", formats=["yyyy-MM-dd"], errors="coerce")
    assert isinstance(nat, LazyNatCount) and nat._value is None  # no scan yet
    # a sort-backed action (the observe-corrupting shape) doesn't disturb it
    out.orderBy(F.col("d").asc_nulls_last()).collect()
    assert nat._value is None
    assert nat == 1 and int(nat) == 1 and nat + 1 == 2  # exact, now cached
    assert nat._value == 1


def test_coerce_numeric_all_or_nothing(spark):
    ok = spark.createDataFrame([("1",), ("2.5",), (None,)], ["x"])
    out, info = coerce_numeric(ok, "x", "double")
    assert info["applied"] and dict(out.dtypes)["x"] == "double"

    bad = spark.createDataFrame([("1",), ("oops",)], ["x"])
    out2, info2 = coerce_numeric(bad, "x", "double")
    assert not info2["applied"] and info2["failed_count"] == 1
    assert dict(out2.dtypes)["x"] == "string"  # column untouched


def test_standardize_oracle(spark, oracle_sf_dir, con):
    df = load_table(spark, oracle_sf_dir, "customer")
    out = (
        standardize_text(df, ["c_mktsegment"])
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    sql = "SELECT lower(trim(c_mktsegment)) AS seg, count(*) AS cnt FROM customer GROUP BY 1"
    compare(out, con, sql, "standardize")


def test_datetime_parse_oracle(spark, oracle_sf_dir, con):
    # round-trip: format the real order date to string, re-parse, group by year
    df = load_table(spark, oracle_sf_dir, "orders").withColumn(
        "d_str", F.date_format("o_orderdate", "yyyy-MM-dd")
    )
    parsed, nat = parse_datetime(df, "d_str", formats=["yyyy-MM-dd"], errors="coerce", target_col="d_parsed")
    assert nat == 0
    out = parsed.groupBy(F.year("d_parsed").alias("yr")).agg(F.count(F.lit(1)).alias("cnt"))
    sql = """
      SELECT year(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d')) AS yr, count(*) AS cnt
      FROM orders GROUP BY 1
    """
    compare(out, con, sql, "dt_parse")


def test_fuzzy_distributed_matches_contract(spark):
    from pyspark.sql import Row

    from analyst_toolkit_spark.operators.normalize import (
        apply_fuzzy_correction_distributed,
        fuzzy_correction_map_distributed,
    )

    df = spark.createDataFrame(
        [Row(v=x) for x in ["Adelie", "Adeliee", "Gentoo", "gentooo", "Chinstrap", "zzzz", None]]
    )
    master = ["Adelie", "Gentoo", "Chinstrap"]
    cmap = {r["value"]: r["corrected"] for r in fuzzy_correction_map_distributed(df, "v", master, 80).collect()}
    assert cmap == {"Adeliee": "Adelie", "gentooo": "Gentoo"}  # zzzz below cutoff

    out = apply_fuzzy_correction_distributed(df, "v", master, 80)
    vals = sorted((r["v"] for r in out.collect()), key=lambda x: (x is None, str(x)))
    assert vals == ["Adelie", "Adelie", "Chinstrap", "Gentoo", "Gentoo", "zzzz", None]


def test_fuzzy_auto_gates_on_plan_size(spark, sf_dir, monkeypatch):
    # mirrors tests/test_pair_scale.py: "auto" keeps the driver map at test
    # scale and routes to the in-plan distributed map above the size gate
    from analyst_toolkit_spark.ingest import load_table
    from analyst_toolkit_spark.operators import normalize as N

    cust = load_table(spark, sf_dir, "customer")
    assert N.fuzzy_strategy(cust) == "driver"
    monkeypatch.setattr(N, "FUZZY_DRIVER_THRESHOLD_BYTES", 0)
    assert N.fuzzy_strategy(cust) == "distributed"

    typod = cust.withColumn(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 7 == 0, F.concat(F.lower("c_mktsegment"), F.lit("x"))).otherwise(
            F.col("c_mktsegment")
        ),
    )
    master = [r[0] for r in cust.select("c_mktsegment").distinct().collect() if r[0]]
    out, cmap = N.apply_fuzzy_correction(typod, "c_mktsegment", master, cutoff=80.0)
    assert cmap is None  # distributed path: the map never leaves the cluster
    got = {(r[0], r[1]) for r in out.groupBy("c_mktsegment").count().collect()}
    want = {(r[0], r[1]) for r in cust.groupBy("c_mktsegment").count().collect()}
    assert got == want  # corrections restore the original distribution


def test_build_fuzzy_map_caps_distinct_collect(spark, monkeypatch):
    from analyst_toolkit_spark.operators import normalize as N

    monkeypatch.setattr(N, "FUZZY_MAX_DISTINCT", 50)
    wide = spark.range(200).selectExpr("concat('v', id) AS v")
    with pytest.raises(ValueError, match="distinct values"):
        N.build_fuzzy_map(wide, "v", ["v1"], 80.0)


def test_fuzzy_distributed_no_driver_collect_of_values(spark):
    from pyspark.sql import Row

    from analyst_toolkit_spark.operators.normalize import fuzzy_correction_map_distributed

    df = spark.createDataFrame([Row(v=f"val{i}") for i in range(100)])
    plan = fuzzy_correction_map_distributed(df, "v", ["value1"])._jdf.queryExecution().executedPlan().toString()
    # whole map builds in-plan: broadcast joins, no local (driver) relation of df values
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
