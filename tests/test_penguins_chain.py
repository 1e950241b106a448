"""Tier-2 fixture (FIXTURES.md §2): dirty-penguins-style table through the FULL
module chain with a config mirroring the reference templates — rename, fuzzy
species/island, value-mapped sex/age/health, datetime parse, keep-first dedup,
IQR outliers → median, imputation, strict certification."""

import random

import pytest
from pyspark.sql import Row

from analyst_toolkit_spark.plans import config as C
from analyst_toolkit_spark.plans.pipeline import run_pipeline

SPECIES = ["Adelie", "Chinstrap", "Gentoo"]
ISLANDS = ["Torgersen", "Biscoe", "Dream", "Shortcut", "Cormorant"]


def _dirty_rows(n=400, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        species = rng.choice(SPECIES)
        if i % 19 == 0:
            species = species + "e"  # typo fixable at cutoff 80
        sex = rng.choice(["MALE", "FEMALE", "male", "m", "f", ".", "?"])
        mass = rng.gauss(4200, 400)
        if i % 97 == 0:
            mass = 25000.0  # heavy outlier
        rows.append(
            Row(
                tag_id=f"T{i:04d}" if i % 41 else None,
                species=species,
                **{"bill length (mm)": rng.gauss(45, 5)},
                island=rng.choice(ISLANDS + ["biscoe island"]),
                sex=sex,
                body_mass_g=mass if i % 23 else None,
                capture_date=f"2021-{1 + i % 12:02d}-{1 + i % 28:02d}" if i % 31 else "garbage",
                age_group=rng.choice(["Adult", "Juvenile", "juvenille", "unk", "ADLT", "chik"]),
            )
        )
    # exact duplicates on the identity subset
    rows += rows[:10]
    return rows


MASTER = {
    "run_id": "penguins",
    "modules": {
        "diagnostics": {"run": True},
        "normalization": {
            "run": True,
            "config": {"normalization": {"rules": {
                "rename_columns": {"bill length (mm)": "bill_length_mm"},
                "standardize_text_columns": [],
                "value_mappings": {
                    "island": {"biscoe island": "Biscoe"},
                    "sex": {"male": "MALE", "m": "MALE", "f": "FEMALE", ".": "null", "?": "UNKNOWN"},
                    "age_group": {"juvenille": "Juvenile", "unk": "UNKNOWN", "ADLT": "Adult", "chik": "Chick"},
                },
                "fuzzy_matching": {"run": True, "settings": {
                    "species": {"master_list": SPECIES, "score_cutoff": 80},
                    "island": {"master_list": ISLANDS, "score_cutoff": 85},
                }},
                "parse_datetimes": {"capture_date": {"format": "%Y-%m-%d", "errors": "coerce", "make_naive": True}},
            }}},
        },
        "validation_gatekeeper": {
            "run": True,
            "config": {"validation": {"schema_validation": {"rules": {
                "categorical_values": {"species": SPECIES, "island": ISLANDS},
            }}}},
        },
        "duplicates": {
            "run": True,
            "config": {"duplicates": {"subset_columns": ["tag_id", "species", "capture_date"],
                                      "keep": "first", "mode": "remove"}},
        },
        "outlier_detection": {
            "run": True,
            "config": {"outlier_detection": {
                "detection_specs": {"body_mass_g": {"method": "iqr", "iqr_multiplier": 1.5}},
                "exclude_columns": ["bill_length_mm", "_row_id"],
            }}},
        "outlier_handling": {
            "run": True,
            "config": {"outlier_handling": {"handling_specs": {"body_mass_g": {"strategy": "median"}}}},
        },
        "imputation": {
            "run": True,
            "config": {"imputation": {"rules": {"strategies": {
                "body_mass_g": "mean",
                "tag_id": {"strategy": "constant", "value": "UNKNOWN"},
                "sex": {"strategy": "constant", "value": "UNKNOWN"},
                "capture_date": {"strategy": "constant", "value": "1900-01-01"},
            }}}},
        },
        "final_audit": {
            "run": True,
            "config": {"final_audit": {"certification": {"schema_validation": {"rules": {
                "categorical_values": {
                    "sex": ["MALE", "FEMALE", "UNKNOWN"],
                    "species": SPECIES,
                    "age_group": ["Adult", "Juvenile", "Chick", "UNKNOWN"],
                },
                "disallowed_null_columns": ["tag_id", "species", "sex", "body_mass_g", "capture_date"],
            }}}}},
        },
    },
}


@pytest.fixture(scope="module")
def run(spark):
    df = spark.createDataFrame(_dirty_rows())
    return run_pipeline(spark, C.pipeline_config(MASTER), df)


def test_certified(run):
    assert run.reports["final_audit"]["certified"]
    assert run.health["overall_score"] > 70


def test_all_dirt_repaired(run):
    rows = run.df.collect()
    assert all(r["species"] in SPECIES for r in rows)
    assert all(r["island"] in ISLANDS for r in rows)
    assert all(r["sex"] in ("MALE", "FEMALE", "UNKNOWN") for r in rows)
    assert all(r["age_group"] in ("Adult", "Juvenile", "Chick", "UNKNOWN") for r in rows)
    assert all(r["body_mass_g"] is not None and r["body_mass_g"] < 25000 for r in rows)
    assert all(r["tag_id"] is not None and r["capture_date"] is not None for r in rows)
    assert "bill_length_mm" in run.df.columns


def test_dedup_removed_duplicates(run):
    # the 10 appended duplicates are gone (identity subset keep=first)
    dup_summary = next(h for h in run.history if h["module"] == "duplicates")
    assert dup_summary["summary"]["duplicate_count"] >= 10
    assert run.df.count() == 400


def test_datetime_parsed_naive(run):
    assert dict(run.df.dtypes)["capture_date"] == "timestamp_ntz"
