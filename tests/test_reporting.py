"""HTML dashboard renderer: per-module panels, metric tiles, inline-SVG
charts from aggregate rows (reference dashboard_views.py surface)."""

import pytest

from analyst_toolkit_spark.ingest import load_table
from analyst_toolkit_spark.plans import config as C
from analyst_toolkit_spark.plans.pipeline import run_pipeline
from analyst_toolkit_spark.reporting import (
    boxplot_svg,
    export_pipeline_dashboard,
    histogram_svg,
    render_pipeline_dashboard,
    render_table,
)


@pytest.fixture(scope="module")
def pipeline_run(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders")
    master = {
        "run_id": "dash_test",
        "modules": {
            "diagnostics": {"run": True},
            "duplicates": {"run": True, "config": {"deduplication": {"subset_columns": ["o_orderkey"]}}},
            "imputation": {
                "run": True,
                "config": {"imputation": {"rules": {"strategies": {"o_totalprice": "median"}}}},
            },
        },
    }
    return run_pipeline(spark, C.pipeline_config(master), df)


def test_dashboard_has_module_sections_and_tiles(pipeline_run):
    page = render_pipeline_dashboard(pipeline_run, title="QA run")
    assert "<!DOCTYPE html>" in page and "</html>" in page
    for module in ("diagnostics", "duplicates", "imputation"):
        assert f">{module} " in page or f">{module}<" in page
    assert "badge completed" in page
    assert "health score" in page
    assert ">100<" in page or ">100.0<" in page  # overall_score surfaced, not N/A
    # diagnostics report table embedded (profile columns)
    assert "null_pct" in page


def test_dashboard_escapes_html(pipeline_run):
    page = render_pipeline_dashboard(pipeline_run, title="<script>alert(1)</script>")
    assert "<script>alert(1)</script>" not in page
    assert "&lt;script&gt;" in page


def test_histogram_svg_from_aggregate(spark, sf_dir):
    from analyst_toolkit_spark.operators.visuals import histogram

    bins = histogram(load_table(spark, sf_dir, "lineitem"), "l_extendedprice", bins=20)
    svg = histogram_svg(bins, title="l_extendedprice")
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    assert svg.count("<rect") == 20


def test_boxplot_svg_from_aggregate(spark, sf_dir):
    from analyst_toolkit_spark.operators.visuals import boxplot_stats

    stats = boxplot_stats(load_table(spark, sf_dir, "lineitem"), ["l_quantity", "l_extendedprice"])
    svg = boxplot_svg(stats)
    assert svg.count("<rect") == 2  # one box per column
    assert "l_quantity" in svg and "l_extendedprice" in svg


def test_export_with_charts(pipeline_run, spark, sf_dir, tmp_path):
    df = load_table(spark, sf_dir, "orders")
    path = export_pipeline_dashboard(
        pipeline_run, str(tmp_path / "dash.html"), df=df, viz_columns=["o_totalprice"], title="QA"
    )
    page = open(path).read()
    assert "Histogram — o_totalprice" in page
    assert "Distribution overview (box)" in page
    assert page.count("<svg") == 2


def test_render_table_handles_shapes(spark):
    assert "<table>" in render_table({"a": 1, "b": 2.5})
    assert "<table>" in render_table([{"x": 1}, {"x": None}])
    assert "empty" in render_table([])
    df = spark.range(3).selectExpr("id", "id * 1.5 as v")
    html = render_table(df)
    assert html.count("<tr>") == 4  # header + 3 rows


def test_toolkit_export_dashboard_tool(spark, sf_dir, tmp_path):
    from analyst_toolkit_spark.tools import Toolkit

    tk = Toolkit(spark)
    tk.call("diagnostics", input_path=f"{sf_dir}/orders.parquet")
    res = tk.call(
        "export_dashboard",
        output_path=str(tmp_path / "tk.html"),
        input_path=f"{sf_dir}/orders.parquet",
        viz_columns=["o_totalprice"],
    )
    assert res["status"] == "pass"
    page = open(res["path"]).read()
    assert "diagnostics" in page and "<svg" in page
