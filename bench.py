#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline set covers the full module suite (profile → validate → normalize →
dedup → outliers → impute) plus the LLM-pipeline operators — the BASELINE.md
protocol."""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "profile_lineitem",
    "profile_customer",
    "dup_count_lineitem",
    "corr_lineitem",
    "validation_summary_orders",
    "dedup_keep_first_lineitem",
    "outlier_iqr_lineitem",
    "outlier_clip_lineitem",
    "impute_mean_customer",
    "impute_mode_customer",
    "normalize_text_customer",
    "datetime_parse_orders",
    "row_diff_orders",
    "value_audit_orders",
    "null_audit_orders",
    "data_dictionary_customer",
    "histogram_price",
    "boxplot_lineitem",
    "pipeline_orders",
    "pricing_summary",
    "join_region_revenue",
    "window_running_total",
    "events_daily",
    "events_sessions",
    "events_json_props",
    "text_stats_documents",
    "exact_dup_docs",
    "fingerprint_dup_docs",
    "minhash_pairs_docs",
    "quality_docs",
    "embedding_topk",
    "embedding_knn",
    "embedding_ivf_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    import __spark_entry__ as entry_mod
    from analyst_toolkit_spark.session import get_spark

    spark = get_spark("analyst_toolkit_spark_bench")
    qs = entry_mod.queries()

    # warm the JVM + parquet footers once (excluded from timings)
    qs["pricing_summary"](spark, sf_dir).count()

    # Best of 3 runs per query: the first run pays one-off codegen compile,
    # and this box sees multi-second bursts of host-level CPU contention — the
    # min is the reproducible, production-representative number.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        best, n = float("inf"), 0
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()  # materialize
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s rows={n}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "module_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
