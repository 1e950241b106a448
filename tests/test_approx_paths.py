"""Approx ('100 TB fast path') mode sanity: sketch-based profile/outlier
results must land within their documented error bounds of the exact answers."""

import pytest

from analyst_toolkit_spark.ingest import load_table
from analyst_toolkit_spark.operators import outliers as M_out
from analyst_toolkit_spark.operators.profile import profile


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem")


def test_profile_approx_close_to_exact(lineitem):
    cols = ["l_quantity", "l_extendedprice"]
    exact = {r["column"]: r for r in profile(lineitem, columns=cols, exact=True).collect()}
    approx = {r["column"]: r for r in profile(lineitem, columns=cols, exact=False, approx_rsd=0.02).collect()}
    for c in cols:
        e, a = exact[c], approx[c]
        assert a["count"] == e["count"] and a["nulls"] == e["nulls"]
        assert a["n_unique"] == pytest.approx(e["n_unique"], rel=0.1)  # HLL rsd 0.02 → wide margin
        for q in ("q25", "q50", "q75"):
            assert a[q] == pytest.approx(e[q], rel=0.05)
        assert a["mean"] == pytest.approx(e["mean"], rel=1e-9)  # mean is never approximated


def test_outlier_bounds_approx_close(lineitem):
    spec = [M_out.OutlierSpec("l_extendedprice", "iqr", 1.5)]
    (lo_e, hi_e) = M_out.compute_bounds(lineitem, spec, exact=True)["l_extendedprice"]
    (lo_a, hi_a) = M_out.compute_bounds(lineitem, spec, exact=False)["l_extendedprice"]
    assert lo_a == pytest.approx(lo_e, rel=0.05)
    assert hi_a == pytest.approx(hi_e, rel=0.05)
