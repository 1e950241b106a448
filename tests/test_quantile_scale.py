"""Size-aware quantile strategy: above QUANTILE_REFINE_THRESHOLD_BYTES the
exact quartiles switch from the builtin ``percentile`` aggregate (single-
threaded merge, O(distinct) memory) to the bounded-memory refine path —
with IDENTICAL results, so the switch is purely an execution-shape choice.

These tests force the switch by dropping the threshold to 0 and assert the
refined path agrees with the builtin path everywhere it is wired in
(profile, outlier bounds, boxplot, median impute).
"""

import math

import pytest

from analyst_toolkit_spark.functions import stats as S
from analyst_toolkit_spark.ingest import load_table
from analyst_toolkit_spark.operators import impute as M_imp
from analyst_toolkit_spark.operators import outliers as M_out
from analyst_toolkit_spark.operators import profile as M_prof
from analyst_toolkit_spark.operators import visuals as M_vis


@pytest.fixture()
def lineitem(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem")


def _force_refined(monkeypatch):
    monkeypatch.setattr(S, "QUANTILE_REFINE_THRESHOLD_BYTES", 0)


def _force_builtin(monkeypatch):
    monkeypatch.setattr(S, "QUANTILE_DRIVER_THRESHOLD_BYTES", 0)


def test_driver_tier_matches_builtin(spark, lineitem, monkeypatch):
    cols_ps = {"l_extendedprice": [0.25, 0.5, 0.75], "l_quantity": [0.5]}
    drv, mm = S.quantiles_driver(lineitem, cols_ps, minmax=True)
    from pyspark.sql import functions as F

    for c, ps in cols_ps.items():
        row = lineitem.agg(
            S.percentile_exact(F.col(c), ps).alias("q"),
            F.min(c).cast("double").alias("mn"),
            F.max(c).cast("double").alias("mx"),
        ).first()
        for a, b in zip(drv[c], row["q"]):
            assert math.isclose(a, float(b), rel_tol=0, abs_tol=1e-9), (c, drv[c], row["q"])
        assert mm[c] == (float(row["mn"]), float(row["mx"]))


def test_driver_tier_row_cap_falls_back_to_refined(spark, lineitem, monkeypatch):
    # simulate a wildly wrong plan-bytes estimate: the row cap trips and the
    # answer comes from the distributed REFINED tier (r5: the builtin
    # percentile aggregate is slowest exactly where the cap trips — 45x on
    # the 10x scale sweep) — identical values, zero rows collected
    cols_ps = {"l_extendedprice": [0.25, 0.5, 0.75]}
    expect, emm, enu = S.quantiles_driver(lineitem, cols_ps, minmax=True, nunique=True)
    monkeypatch.setattr(S, "QUANTILE_DRIVER_MAX_ROWS", 10)
    got, gmm, gnu = S.quantiles_driver(lineitem, cols_ps, minmax=True, nunique=True)
    for a, b in zip(expect["l_extendedprice"], got["l_extendedprice"]):
        assert math.isclose(a, b, rel_tol=0, abs_tol=1e-9)
    assert gmm == emm and gnu == enu


def test_driver_tier_row_cap_all_null(spark, monkeypatch):
    monkeypatch.setattr(S, "QUANTILE_DRIVER_MAX_ROWS", 2)
    df = spark.createDataFrame([(None,)] * 5, "x double")
    qs, mm = S.quantiles_driver(df, {"x": [0.5]}, minmax=True)
    assert qs["x"] == [None] and mm["x"] == (None, None)


def test_driver_tier_all_null_column(spark):
    df = spark.createDataFrame([(None,), (None,)], "x double")
    qs, mm = S.quantiles_driver(df, {"x": [0.5]}, minmax=True)
    assert qs["x"] == [None] and mm["x"] == (None, None)


def test_strategy_picks_by_plan_size(spark, lineitem, monkeypatch):
    # parquet scan carries footer stats -> size known and tiny at sf0.001
    assert S.plan_size_bytes(lineitem) > 0
    assert S.quantile_strategy(lineitem) == "driver"
    assert S.quantile_strategy(lineitem, exact=False) == "approx"
    # between the driver gate and the refine gate: builtin
    monkeypatch.setattr(S, "QUANTILE_DRIVER_THRESHOLD_BYTES", 0)
    assert S.quantile_strategy(lineitem) == "builtin"
    _force_refined(monkeypatch)
    assert S.quantile_strategy(lineitem) == "refined"
    # explicit threshold overrides the global
    assert S.quantile_strategy(lineitem, threshold_bytes=1 << 60) != "refined"


def test_strategy_unknown_size_stays_builtin(spark):
    df = spark.range(10).selectExpr("id", "id * 2 as v")
    # range relations report huge/unknown stats in some plans; whatever the
    # estimate, an unknown (-1) must never flip to refined
    if S.plan_size_bytes(df) == -1:
        assert S.quantile_strategy(df) == "builtin"


def test_profile_refined_matches_builtin(spark, lineitem, monkeypatch):
    with monkeypatch.context() as m:
        _force_builtin(m)
        base = {r["column"]: r.asDict() for r in M_prof.profile(lineitem).collect()}
    _force_refined(monkeypatch)
    ref = {r["column"]: r.asDict() for r in M_prof.profile(lineitem).collect()}
    assert base.keys() == ref.keys()
    for col in base:
        for k in ("q25", "q50", "q75"):
            b, r = base[col][k], ref[col][k]
            if b is None:
                assert r is None, (col, k)
            else:
                assert math.isclose(b, r, rel_tol=0, abs_tol=1e-9), (col, k, b, r)


def test_outlier_bounds_refined_match(spark, lineitem, monkeypatch):
    specs = [
        M_out.OutlierSpec("l_extendedprice", "iqr", 1.5),
        M_out.OutlierSpec("l_quantity", "zscore", threshold=3.0),
    ]
    with monkeypatch.context() as m:
        _force_builtin(m)
        base = M_out.compute_bounds(lineitem, specs)
    _force_refined(monkeypatch)
    ref = M_out.compute_bounds(lineitem, specs)
    assert base.keys() == ref.keys()
    for c in base:
        for b, r in zip(base[c], ref[c]):
            assert math.isclose(b, r, rel_tol=0, abs_tol=1e-6), (c, base[c], ref[c])


def test_boxplot_refined_matches(spark, lineitem, monkeypatch):
    cols = ["l_quantity", "l_extendedprice"]
    with monkeypatch.context() as m:
        _force_builtin(m)
        base = {r["column"]: r.asDict() for r in M_vis.boxplot_stats(lineitem, cols).collect()}
    drv = {r["column"]: r.asDict() for r in M_vis.boxplot_stats(lineitem, cols).collect()}
    _force_refined(monkeypatch)
    ref = {r["column"]: r.asDict() for r in M_vis.boxplot_stats(lineitem, cols).collect()}
    assert base == ref == drv


def test_impute_median_refined_matches(spark, lineitem, monkeypatch):
    specs = [M_imp.ImputeSpec("l_discount", "median")]
    with monkeypatch.context() as m:
        _force_builtin(m)
        _, base = M_imp.impute(lineitem, specs)
    _force_refined(monkeypatch)
    _, ref = M_imp.impute(lineitem, specs)
    assert base.keys() == ref.keys()
    for c in base:
        assert math.isclose(float(base[c]), float(ref[c]), rel_tol=0, abs_tol=1e-9)
