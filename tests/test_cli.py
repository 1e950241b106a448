"""CLI entry-point + table_stats tests."""

import json
import os

import yaml

from analyst_toolkit_spark.cli import main
from analyst_toolkit_spark.ingest import load_table
from analyst_toolkit_spark.operators.profile import table_stats


def test_table_stats(spark, sf_dir):
    st = table_stats(load_table(spark, sf_dir, "customer"))
    assert st["rows"] > 0 and st["columns"] == 5 and st["estimated_bytes"] > 0


def test_cli_end_to_end(spark, sf_dir, tmp_path, capsys):
    master = {
        "run_id": "cli_test",
        "modules": {
            "diagnostics": {"run": True},
            "validation": {
                "run": True,
                "config": {"validation": {"schema_validation": {"rules": {
                    "categorical_values": {"c_mktsegment": [
                        "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]},
                }}}},
            },
        },
    }
    cfg_path = tmp_path / "master.yaml"
    cfg_path.write_text(yaml.safe_dump(master))
    out_path = str(tmp_path / "certified.parquet")
    rep_dir = str(tmp_path / "reports")

    rc = main([
        "--config", str(cfg_path), "--output", out_path, "--report-dir", rep_dir,
        "--sf-dir", sf_dir, "--table", "customer",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["run_id"] == "cli_test" and "overall_score" in summary["health"]
    assert spark.read.parquet(out_path).count() > 0
    assert os.path.exists(os.path.join(rep_dir, "report.html"))
    assert os.path.exists(os.path.join(rep_dir, "run_history.csv"))
