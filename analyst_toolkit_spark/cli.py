"""CLI entry point — the reference's ``python -m analyst_toolkit.run_toolkit_pipeline``
(run_toolkit_pipeline.py:192-208) re-expressed over the Spark pipeline runner.

Usage:
    python -m analyst_toolkit_spark --config master.yaml [--output out.parquet]
                                    [--report-dir reports/] [--sf-dir DIR --table lineitem]
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="analyst_toolkit_spark")
    ap.add_argument("--config", required=True, help="master pipeline YAML (run_toolkit_config shape)")
    ap.add_argument("--output", help="write the certified DataFrame here (parquet/csv by extension)")
    ap.add_argument("--report-dir", help="export module reports as CSVs + an HTML dashboard")
    ap.add_argument("--viz-columns", help="comma-separated numeric columns to chart in the dashboard")
    ap.add_argument("--sf-dir", help="read the input from a testdata scale-factor dir instead of pipeline_entry_path")
    ap.add_argument("--table", default="lineitem", help="table name when --sf-dir is used")
    args = ap.parse_args(argv)

    from analyst_toolkit_spark.ingest import load_table
    from analyst_toolkit_spark.plans import config as C
    from analyst_toolkit_spark.plans.pipeline import run_pipeline
    from analyst_toolkit_spark.session import get_spark
    from analyst_toolkit_spark.sources import io as S_io

    spark = get_spark("analyst_toolkit_spark_cli")
    cfg = C.pipeline_config(C.load_yaml(args.config))
    df = load_table(spark, args.sf_dir, args.table) if args.sf_dir else None
    run = run_pipeline(spark, cfg, df)

    if args.output:
        S_io.save_output(run.df, args.output)
    if args.report_dir:
        from analyst_toolkit_spark.reporting import export_pipeline_dashboard

        reports = {"run_history": run.history, "health": run.health["breakdown"]}
        for name, rep in run.reports.items():
            reports[name] = rep
        S_io.export_report(reports, args.report_dir)
        viz = [c.strip() for c in args.viz_columns.split(",")] if args.viz_columns else None
        export_pipeline_dashboard(
            run,
            f"{args.report_dir}/report.html",
            df=run.df if viz else None,
            viz_columns=viz,
            title=f"QA run {run.run_id}",
        )

    print(json.dumps({"run_id": run.run_id, "health": run.health, "modules": [h["module"] for h in run.history]}))
    certified = all(h["status"] == "completed" for h in run.history)
    return 0 if certified else 1


if __name__ == "__main__":
    sys.exit(main())
