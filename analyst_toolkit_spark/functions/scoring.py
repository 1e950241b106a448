"""Data Health Score — exact reference formulas.

Reference m00_utils/scoring.py:10-64 (weights 0.40/0.30/0.15/0.15, thresholds
70/90) and mcp_server/tools/cockpit_runtime.py:99-130 (metric folding from the
run-history ledger: validation passed→1.0 else 0.5; dup/outlier ratio =
count/row_count with a min(0.2, count/1000) fallback when row_count missing).
Driver-side arithmetic over already-collected metrics — no Spark jobs here.
"""

from __future__ import annotations

WEIGHTS = {
    "completeness": 0.40,
    "validity": 0.30,
    "uniqueness": 0.15,
    "consistency": 0.15,
}


def calculate_health_score(metrics: dict) -> dict:
    """0-100 weighted score from null_rate / validation_pass_rate /
    outlier_ratio / duplicate_ratio (all 0-1)."""
    null_rate = metrics.get("null_rate", 0.0)
    val_pass_rate = metrics.get("validation_pass_rate", 1.0)
    outlier_ratio = metrics.get("outlier_ratio", 0.0)
    dup_ratio = metrics.get("duplicate_ratio", 0.0)

    comp_score = (1.0 - null_rate) * 100
    valid_score = val_pass_rate * 100
    unique_score = (1.0 - dup_ratio) * 100
    consist_score = (1.0 - outlier_ratio) * 100

    total = (
        comp_score * WEIGHTS["completeness"]
        + valid_score * WEIGHTS["validity"]
        + unique_score * WEIGHTS["uniqueness"]
        + consist_score * WEIGHTS["consistency"]
    )
    status = "green"
    if total < 70:
        status = "red"
    elif total < 90:
        status = "yellow"
    return {
        "overall_score": round(total, 1),
        "status": status,
        "breakdown": {
            "completeness": round(comp_score, 1),
            "validity": round(valid_score, 1),
            "uniqueness": round(unique_score, 1),
            "consistency": round(consist_score, 1),
        },
    }


def metrics_from_history(history: list[dict]) -> dict:
    """Fold module run summaries into score inputs (cockpit_runtime.py:99-130).

    Each entry: {"module": name, "summary": {...}}. Later entries for the same
    module win (the reference iterates in order and overwrites).
    """
    metrics = {
        "null_rate": 0.0,
        "validation_pass_rate": 1.0,
        "outlier_ratio": 0.0,
        "duplicate_ratio": 0.0,
    }
    for entry in history:
        module = entry.get("module")
        summary = entry.get("summary", {}) or {}
        if not isinstance(summary, dict):
            summary = {}
        row_count = summary.get("row_count")
        if module == "diagnostics":
            metrics["null_rate"] = summary.get("null_rate", 0.0)
        elif module == "validation":
            metrics["validation_pass_rate"] = 1.0 if summary.get("passed", True) else 0.5
        elif module == "duplicates":
            count = summary.get("duplicate_count", 0)
            metrics["duplicate_ratio"] = count / row_count if row_count else min(0.2, count / 1000)
        elif module == "outliers":
            count = summary.get("outlier_count", 0)
            metrics["outlier_ratio"] = count / row_count if row_count else min(0.2, count / 1000)
    return metrics
