"""Config plane: YAML module configs → typed specs for the operator layer.

Mirrors the reference's per-module YAML contract (config/*.yaml and
m00_utils/config_loader.py:11-25, pipeline_config_validation.py) including the
pandas dtype vocabulary (``object``/``float64``/``int64``…) so reference
configs run unchanged — dtypes are translated to Spark types here, at the
plan-build boundary.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import yaml

from analyst_toolkit_spark.operators.final_audit import FinalAuditConfig
from analyst_toolkit_spark.operators.impute import ImputeSpec
from analyst_toolkit_spark.operators.outliers import OutlierSpec
from analyst_toolkit_spark.operators.validation import ValidationConfig

# pandas dtype name -> Spark SQL type name (SURVEY §1.2)
PANDAS_TO_SPARK = {
    "object": "string",
    "str": "string",
    "string": "string",
    "float64": "double",
    "float32": "float",
    "float": "double",
    "int64": "bigint",
    "int32": "int",
    "int": "bigint",
    "bool": "boolean",
    "boolean": "boolean",
    "category": "string",
    "datetime64[ns]": "timestamp",
    "datetime64": "timestamp",
}


def to_spark_type(dtype: str) -> str:
    return PANDAS_TO_SPARK.get(str(dtype).strip().lower(), str(dtype).strip().lower())


def load_yaml(path: str) -> dict:
    with open(path) as fh:
        loaded = yaml.safe_load(fh) or {}
    if not isinstance(loaded, dict):
        raise ValueError(f"config at {path} did not parse to a mapping")
    return loaded


def _root(cfg: dict, key: str) -> dict:
    """Configs may be wrapped under their module key (validation: {...})."""
    inner = cfg.get(key, cfg)
    return inner if isinstance(inner, dict) else {}


# --- per-module builders ----------------------------------------------------


def validation_config(cfg: dict) -> tuple[ValidationConfig, bool]:
    """(rules, fail_on_error) from a validation/certification block
    (config/validation_config_template.yaml:10-67)."""
    root = _root(cfg, "validation")
    if "validation" not in cfg and "certification" in cfg:
        root = _root(cfg, "certification")
    sv = root.get("schema_validation", root) or {}
    rules = sv.get("rules", sv) or {}
    # golden-template shorthand (reference config_normalizers.py:302-340 /
    # golden_templates/*.yaml): rules.range_checks ≡ numeric_ranges
    numeric_ranges = dict(rules.get("numeric_ranges") or rules.get("range_checks") or {})
    return (
        ValidationConfig(
            expected_columns=list(rules.get("expected_columns") or []),
            expected_types={c: to_spark_type(t) for c, t in (rules.get("expected_types") or {}).items()},
            categorical_values=dict(rules.get("categorical_values") or {}),
            numeric_ranges=numeric_ranges,
            non_null_columns=list(rules.get("disallowed_null_columns") or []),
        ),
        bool(sv.get("fail_on_error", False)),
    )


@dataclass
class NormalizationRules:
    rename_columns: dict[str, str] = field(default_factory=dict)
    standardize_text_columns: list[str] = field(default_factory=list)
    value_mappings: dict[str, dict] = field(default_factory=dict)
    fuzzy_matching: dict[str, dict] = field(default_factory=dict)  # col -> {master_list, score_cutoff}
    parse_datetimes: dict[str, dict] = field(default_factory=dict)  # col -> {format(s), errors, ...}
    coerce_dtypes: dict[str, str] = field(default_factory=dict)


def normalization_rules(cfg: dict) -> NormalizationRules:
    root = _root(cfg, "normalization")
    rules = root.get("rules", root) or {}
    fuzzy = rules.get("fuzzy_matching") or {}
    fuzzy_settings = fuzzy.get("settings", {}) if fuzzy.get("run", True) else {}
    return NormalizationRules(
        rename_columns=dict(rules.get("rename_columns") or {}),
        standardize_text_columns=list(rules.get("standardize_text_columns") or []),
        value_mappings=dict(rules.get("value_mappings") or {}),
        fuzzy_matching={c: dict(s) for c, s in fuzzy_settings.items()},
        parse_datetimes=dict(rules.get("parse_datetimes") or {}),
        coerce_dtypes={c: to_spark_type(t) for c, t in (rules.get("coerce_dtypes") or {}).items()},
    )


@dataclass
class DuplicatesConfig:
    subset_columns: list[str] | None = None
    keep: str = "first"
    mode: str = "flag"  # flag | remove


def duplicates_config(cfg: dict) -> DuplicatesConfig:
    root = _root(cfg, "duplicates")
    return DuplicatesConfig(
        subset_columns=root.get("subset_columns") or None,
        keep=root.get("keep", "first"),
        mode=root.get("mode", "flag"),
    )


def outlier_specs(cfg: dict, numeric_cols: list[str]) -> list[OutlierSpec]:
    """detection_specs with per-column overrides + __default__ fallback over
    all numeric columns minus exclude_columns
    (config/outlier_config_template.yaml:23-41)."""
    root = _root(cfg, "outlier_detection")
    if "outlier_detection" not in cfg and "outliers" in cfg:
        root = _root(cfg, "outliers")
    det = dict(root.get("detection_specs", root.get("specs", {})) or {})
    # golden-template shorthand (config_normalizers.py:302-340):
    # {method, iqr_multiplier|zscore_threshold, columns} → per-column specs
    # (canonical per-column entries win), or __default__ when no columns given
    method = root.get("method")
    if isinstance(method, str) and method in ("iqr", "zscore"):
        spec: dict = {"method": method}
        if method == "iqr" and isinstance(root.get("iqr_multiplier"), (int, float)):
            spec["iqr_multiplier"] = float(root["iqr_multiplier"])
        if method == "zscore" and isinstance(root.get("zscore_threshold"), (int, float)):
            spec["zscore_threshold"] = float(root["zscore_threshold"])
        columns = root.get("columns")
        if isinstance(columns, list) and columns:
            for col in columns:
                if isinstance(col, str) and col.strip():
                    det[col.strip()] = {**spec, **(det.get(col.strip()) or {})}
        elif "__default__" not in det:
            det["__default__"] = spec
    exclude = set(root.get("exclude_columns") or [])
    default = det.get("__default__")
    specs: list[OutlierSpec] = []
    for col in numeric_cols:
        if col in exclude:
            continue
        raw = det.get(col, default)
        if not isinstance(raw, dict):
            continue
        specs.append(
            OutlierSpec(
                column=col,
                method=raw.get("method", "iqr"),
                multiplier=float(raw.get("iqr_multiplier", 1.5)),
                threshold=float(raw.get("zscore_threshold", 3.0)),
            )
        )
    return specs


def handling_specs(cfg: dict) -> dict[str, dict]:
    """col -> {strategy, fill_value}; __default__/__global__ resolved by the
    pipeline per detected column (config/handling_config_template.yaml:24-40)."""
    root = _root(cfg, "outlier_handling")
    return dict(root.get("handling_specs") or {})


def impute_specs(cfg: dict) -> list[ImputeSpec]:
    """rules.strategies: either 'mean'-style strings or {strategy, value}
    mappings (config/imputation_config_template.yaml:6-40)."""
    root = _root(cfg, "imputation")
    rules = root.get("rules", root) or {}
    strategies = rules.get("strategies", rules) or {}
    specs = []
    for col, raw in strategies.items():
        if isinstance(raw, str):
            specs.append(ImputeSpec(column=col, strategy=raw))
        elif isinstance(raw, dict):
            specs.append(ImputeSpec(column=col, strategy=raw.get("strategy", "constant"), value=raw.get("value")))
    return specs


def final_audit_config(cfg: dict) -> FinalAuditConfig:
    root = _root(cfg, "final_audit")
    edits = root.get("final_edits", {}) or {}
    cert_raw = root.get("certification", {}) or {}
    cert, _ = validation_config({"validation": cert_raw})
    rules = (cert_raw.get("schema_validation", {}) or {}).get("rules", {}) or {}
    return FinalAuditConfig(
        drop_columns=list(edits.get("drop_columns") or []),
        rename_columns=dict(edits.get("rename_columns") or {}),
        coerce_dtypes={c: to_spark_type(t) for c, t in (edits.get("coerce_dtypes") or {}).items()},
        certification=cert,
        disallowed_null_columns=list(rules.get("disallowed_null_columns") or []),
    )


# --- master pipeline config --------------------------------------------------

MODULE_ORDER = (
    "diagnostics",
    "validation",
    "normalization",
    "validation_gatekeeper",
    "duplicates",
    "outlier_detection",
    "outlier_handling",
    "imputation",
    "final_audit",
)


@dataclass
class PipelineConfig:
    run_id: str = "run"
    pipeline_entry_path: str | None = None
    modules: dict[str, dict] = field(default_factory=dict)  # name -> resolved module config
    checkpoint_dir: str | None = None

    def enabled(self, name: str) -> bool:
        mod = self.modules.get(name)
        return bool(mod) and mod.get("run", True)

    def module_config(self, name: str) -> dict:
        return self.modules.get(name, {}).get("config", {})


def pipeline_config(master: dict, base_dir: str = ".") -> PipelineConfig:
    """Parse the master config (config/run_toolkit_config.yaml shape): each
    module block has a run flag and either an inline ``config`` mapping or a
    ``config_path`` to a per-module YAML."""
    import os

    modules: dict[str, dict] = {}
    for name, block in (master.get("modules") or {}).items():
        if name not in MODULE_ORDER:
            raise ValueError(f"unknown module {name!r}; expected one of {MODULE_ORDER}")
        block = dict(block or {})
        if "config" not in block and block.get("config_path"):
            block["config"] = load_yaml(os.path.join(base_dir, block["config_path"]))
        block.setdefault("config", {})
        modules[name] = block
    return PipelineConfig(
        run_id=str(master.get("run_id", "run")),
        pipeline_entry_path=master.get("pipeline_entry_path"),
        modules=modules,
        checkpoint_dir=master.get("checkpoint_dir"),
    )
