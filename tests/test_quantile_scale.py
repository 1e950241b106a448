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


def test_strategy_picks_by_plan_size(spark, lineitem, monkeypatch):
    # parquet scan carries footer stats -> size known and small at sf0.001
    assert S.plan_size_bytes(lineitem) > 0
    assert S.quantile_strategy(lineitem) == "builtin"
    assert S.quantile_strategy(lineitem, exact=False) == "approx"
    _force_refined(monkeypatch)
    assert S.quantile_strategy(lineitem) == "refined"
    # explicit threshold overrides the global
    assert S.quantile_strategy(lineitem, threshold_bytes=1 << 60) == "builtin"


def test_strategy_unknown_size_stays_builtin(spark):
    df = spark.range(10).selectExpr("id", "id * 2 as v")
    # range relations report huge/unknown stats in some plans; whatever the
    # estimate, an unknown (-1) must never flip to refined
    if S.plan_size_bytes(df) == -1:
        assert S.quantile_strategy(df) == "builtin"


def test_profile_refined_matches_builtin(spark, lineitem, monkeypatch):
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
    base = M_out.compute_bounds(lineitem, specs)
    _force_refined(monkeypatch)
    ref = M_out.compute_bounds(lineitem, specs)
    assert base.keys() == ref.keys()
    for c in base:
        for b, r in zip(base[c], ref[c]):
            assert math.isclose(b, r, rel_tol=0, abs_tol=1e-6), (c, base[c], ref[c])


def test_boxplot_refined_matches(spark, lineitem, monkeypatch):
    cols = ["l_quantity", "l_extendedprice"]
    base = {r["column"]: r.asDict() for r in M_vis.boxplot_stats(lineitem, cols).collect()}
    _force_refined(monkeypatch)
    ref = {r["column"]: r.asDict() for r in M_vis.boxplot_stats(lineitem, cols).collect()}
    assert base == ref


def test_impute_median_refined_matches(spark, lineitem, monkeypatch):
    specs = [M_imp.ImputeSpec("l_discount", "median")]
    _, base = M_imp.impute(lineitem, specs)
    _force_refined(monkeypatch)
    _, ref = M_imp.impute(lineitem, specs)
    assert base.keys() == ref.keys()
    for c in base:
        assert math.isclose(float(base[c]), float(ref[c]), rel_tol=0, abs_tol=1e-9)
