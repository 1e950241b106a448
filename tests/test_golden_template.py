"""Tier-3 fixture (FIXTURES.md §3): fraud-shaped golden template with
SHORTHAND configs (reference config/golden_templates/fraud_detection.yaml +
config_normalizers.py:302-340) through the pipeline."""

import pytest
from pyspark.sql import Row

from analyst_toolkit_spark.plans import config as C
from analyst_toolkit_spark.plans.pipeline import run_pipeline


def _fraud_rows(n=200):
    rows = []
    for i in range(n):
        rows.append(
            Row(
                user_id=i,
                transaction_amount=25000.0 if i == 13 else 50.0 + (i % 90),
                frequency_24h=65.0 if i == 77 else float(i % 6),
                device_id=f"d{i % 60}",
                user_email=f"u{i % 60}@x.com",
                billing_zip=f"9{i % 60:04d}",
                consent_flag=["Y", "N", "PENDING"][i % 3],
                first_name=f"  name{i} ",
                created_at="2024-03-01",
                is_active=bool(i % 2),
            )
        )
    return rows


GOLDEN = {
    "run_id": "fraud",
    "modules": {
        "outlier_detection": {
            "run": True,
            # SHORTHAND: method/multiplier/columns instead of detection_specs
            "config": {"outliers": {
                "method": "iqr",
                "iqr_multiplier": 1.1,
                "columns": ["transaction_amount", "frequency_24h"],
            }},
        },
        "duplicates": {
            "run": True,
            "config": {"duplicates": {"subset_columns": ["device_id", "user_email", "billing_zip"], "mode": "flag"}},
        },
        "validation": {
            "run": True,
            # SHORTHAND: rules directly under validation, range_checks key
            "config": {"validation": {"rules": {
                "range_checks": {"transaction_amount": {"min": 0, "max": 10000}},
                "categorical_values": {"consent_flag": ["Y", "N", "PENDING"]},
            }}},
        },
    },
}


def test_shorthand_outlier_specs_normalize():
    specs = C.outlier_specs(GOLDEN["modules"]["outlier_detection"]["config"],
                            ["transaction_amount", "frequency_24h", "user_id"])
    by_col = {s.column: s for s in specs}
    assert set(by_col) == {"transaction_amount", "frequency_24h"}  # only listed columns
    assert by_col["transaction_amount"].method == "iqr"
    assert by_col["transaction_amount"].multiplier == 1.1


def test_shorthand_range_checks_normalize():
    vcfg, _ = C.validation_config(GOLDEN["modules"]["validation"]["config"])
    assert vcfg.numeric_ranges == {"transaction_amount": {"min": 0, "max": 10000}}
    assert "consent_flag" in vcfg.categorical_values


def test_golden_template_run(spark):
    run = run_pipeline(spark, C.pipeline_config(GOLDEN), spark.createDataFrame(_fraud_rows()))
    val = next(h for h in run.history if h["module"] == "validation")
    assert val["summary"]["failed_rules"] == ["range:transaction_amount"]  # the 25k spike
    out = next(h for h in run.history if h["module"] == "outliers")
    assert out["summary"]["outlier_count"] >= 2  # both injected spikes flagged
    dup = next(h for h in run.history if h["module"] == "duplicates")
    assert dup["summary"]["duplicate_count"] == 200  # every identity triple repeats
