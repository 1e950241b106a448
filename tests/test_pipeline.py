"""Master pipeline runner + config plane + health score tests
(reference run_toolkit_pipeline.py chain, scoring.py formulas)."""

import pytest
from pyspark.sql import Row

from analyst_toolkit_spark.functions.scoring import calculate_health_score, metrics_from_history
from analyst_toolkit_spark.plans import config as C
from analyst_toolkit_spark.plans.pipeline import run_pipeline, strptime_to_spark


def test_health_score_formula():
    res = calculate_health_score(
        {"null_rate": 0.1, "validation_pass_rate": 0.5, "outlier_ratio": 0.05, "duplicate_ratio": 0.02}
    )
    # 0.4*90 + 0.3*50 + 0.15*98 + 0.15*95 = 79.95 (float repr 79.95000...02 -> 80.0),
    # identical to what the reference's formula computes on the same inputs
    assert res["overall_score"] == 80.0
    assert res["status"] == "yellow"
    assert res["breakdown"]["completeness"] == 90.0


def test_health_score_thresholds():
    assert calculate_health_score({})["status"] == "green"
    assert calculate_health_score({"null_rate": 0.8})["status"] == "red"


def test_metrics_folding():
    history = [
        {"module": "diagnostics", "summary": {"null_rate": 0.2, "row_count": 100}},
        {"module": "validation", "summary": {"passed": False}},
        {"module": "duplicates", "summary": {"duplicate_count": 10, "row_count": 100}},
        {"module": "outliers", "summary": {"outlier_count": 300}},  # no row_count -> fallback
    ]
    m = metrics_from_history(history)
    assert m["null_rate"] == 0.2
    assert m["validation_pass_rate"] == 0.5  # passed -> 0.5 folding
    assert m["duplicate_ratio"] == 0.1
    assert m["outlier_ratio"] == 0.2  # min(0.2, 300/1000)


def test_strptime_translation():
    assert strptime_to_spark("%Y-%m-%d") == "yyyy-MM-dd"
    assert strptime_to_spark("%d/%m/%Y %H:%M:%S") == "dd/MM/yyyy HH:mm:ss"


def test_pandas_dtype_mapping():
    assert C.to_spark_type("object") == "string"
    assert C.to_spark_type("float64") == "double"
    assert C.to_spark_type("int64") == "bigint"
    assert C.to_spark_type("double") == "double"


@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        Row(tag="t1", species="Adelie", mass=4000.0, sex="male", day="2021-01-01"),
        Row(tag="t2", species="Adeliee", mass=4100.0, sex="FEMALE", day="2021-01-02"),
        Row(tag="t3", species="Gentoo", mass=None, sex="f", day="2021-01-03"),
        Row(tag="t4", species="Gentoo", mass=99999.0, sex="MALE", day="2021-01-04"),  # outlier
        Row(tag="t4", species="Gentoo", mass=99999.0, sex="MALE", day="2021-01-04"),  # dup
        Row(tag="t5", species="Chinstrap", mass=3800.0, sex=None, day="not-a-date"),
    ] + [Row(tag=f"x{i}", species="Adelie", mass=4000.0 + i, sex="MALE", day="2021-02-01") for i in range(20)]
    return spark.createDataFrame(rows)


MASTER = {
    "run_id": "test_run",
    "modules": {
        "diagnostics": {"run": True},
        "validation": {
            "run": True,
            "config": {
                "validation": {
                    "schema_validation": {
                        "run": True,
                        "fail_on_error": False,
                        "rules": {"categorical_values": {"species": ["Adelie", "Gentoo", "Chinstrap"]}},
                    }
                }
            },
        },
        "normalization": {
            "run": True,
            "config": {
                "normalization": {
                    "rules": {
                        "value_mappings": {"sex": {"male": "MALE", "f": "FEMALE", "female": "FEMALE"}},
                        "fuzzy_matching": {
                            "run": True,
                            "settings": {"species": {"master_list": ["Adelie", "Gentoo", "Chinstrap"], "score_cutoff": 80}},
                        },
                        "parse_datetimes": {"day": {"format": "%Y-%m-%d", "errors": "coerce"}},
                    }
                }
            },
        },
        "validation_gatekeeper": {
            "run": True,
            "config": {
                "validation": {
                    "schema_validation": {
                        "rules": {"categorical_values": {"species": ["Adelie", "Gentoo", "Chinstrap"]}}
                    }
                }
            },
        },
        "duplicates": {
            "run": True,
            "config": {"duplicates": {"subset_columns": ["tag"], "keep": "first", "mode": "remove"}},
        },
        "outlier_detection": {
            "run": True,
            "config": {
                "outlier_detection": {
                    "detection_specs": {"mass": {"method": "iqr", "iqr_multiplier": 1.5}},
                }
            },
        },
        "outlier_handling": {
            "run": True,
            "config": {"outlier_handling": {"handling_specs": {"mass": {"strategy": "median"}}}},
        },
        "imputation": {
            "run": True,
            "config": {
                "imputation": {
                    "rules": {"strategies": {"mass": "mean", "sex": {"strategy": "constant", "value": "UNKNOWN"}}}
                }
            },
        },
        "final_audit": {
            "run": True,
            "config": {
                "final_audit": {
                    "certification": {
                        "schema_validation": {
                            "rules": {
                                "categorical_values": {"sex": ["MALE", "FEMALE", "UNKNOWN"]},
                                "disallowed_null_columns": ["mass", "sex", "species"],
                            }
                        }
                    }
                }
            },
        },
    },
}


def test_pipeline_end_to_end(spark, dirty):
    cfg = C.pipeline_config(MASTER)
    run = run_pipeline(spark, cfg, dirty)

    modules_run = [h["module"] for h in run.history]
    assert modules_run == [
        "diagnostics", "validation", "normalization", "validation",
        "duplicates", "outliers", "outlier_handling", "imputation", "final_audit",
    ]
    # fuzzy fixed the typo, remap fixed casing, dup removed, outlier median'd, nulls filled
    rows = run.df.collect()
    assert all(r["species"] in ("Adelie", "Gentoo", "Chinstrap") for r in rows)
    assert all(r["sex"] in ("MALE", "FEMALE", "UNKNOWN") for r in rows)
    assert len(rows) == 25  # 26 minus the dup
    assert all(r["mass"] is not None and r["mass"] < 99999.0 for r in rows)
    assert run.reports["final_audit"]["certified"]
    assert run.health["overall_score"] > 80
    assert dict(run.df.dtypes)["day"].startswith("timestamp")


def test_pipeline_gatekeeper_raises(spark, dirty):
    master = {
        "run_id": "gate",
        "modules": {
            "validation_gatekeeper": {
                "run": True,
                "config": {
                    "validation": {
                        "schema_validation": {
                            "rules": {"categorical_values": {"species": ["Adelie"]}},
                        }
                    }
                },
            }
        },
    }
    with pytest.raises(ValueError, match="validation gate failed"):
        run_pipeline(spark, C.pipeline_config(master), dirty)


def test_unknown_module_rejected():
    with pytest.raises(ValueError, match="unknown module"):
        C.pipeline_config({"modules": {"nonsense": {"run": True}}})
