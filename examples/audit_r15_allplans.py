"""r15 optimization round (session 4) — registry-wide plan-shape audit.

For EVERY declared query, capture the formatted physical plan at sf0.01 and
count structural hazards: parquet scans (duplicated subtrees show as extra
scans unless a ReusedExchange/LogicalRDD covers them), exchanges, Python
boundary nodes, and cartesian/nested-loop joins. Lead generator for
double-evaluation hunts (guide §1.2, §7.2) — high scan counts are leads,
not verdicts (self-joins and size-gated recompute forms are legitimate).

Run: python examples/audit_r15_allplans.py [sf_dir] [out_tsv]
"""

from __future__ import annotations

import os
import re
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analyst_toolkit_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_tsv = sys.argv[2] if len(sys.argv) > 2 else "/tmp/plan_audit_r15.tsv"
    spark = get_spark("audit_r15_allplans")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    rows = []
    for name, fn in sorted(qs.items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            rows.append((name, -1, -1, -1, -1, -1, "ERROR"))
            print(f"{name}: ERROR\n{traceback.format_exc()}", flush=True)
            continue
        scans = len(re.findall(r"Scan parquet", plan))
        reused = len(re.findall(r"ReusedExchange|ReusedSubquery", plan))
        exch = len(re.findall(r"\bExchange\b", plan)) - len(
            re.findall(r"ReusedExchange", plan)
        )
        py = len(re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", plan))
        cart = len(re.findall(r"CartesianProduct|BroadcastNestedLoopJoin", plan))
        rdd = len(re.findall(r"Scan ExistingRDD|LogicalRDD", plan))
        rows.append((name, scans, exch, py, cart, rdd, f"reused={reused}"))
        print(f"{name:45s} scans={scans:3d} exch={exch:3d} py={py} cart={cart} rdd={rdd} reused={reused}", flush=True)

    with open(out_tsv, "w") as f:
        f.write("query\tscans\texchanges\tpython\tcartesian\trdd\tnote\n")
        for r in rows:
            f.write("\t".join(str(x) for x in r) + "\n")

    print("\n== top by parquet scans ==")
    for r in sorted(rows, key=lambda r: -r[1])[:30]:
        print(f"{r[0]:45s} scans={r[1]:3d} exch={r[2]:3d} {r[6]}")
    print("\n== top by exchanges ==")
    for r in sorted(rows, key=lambda r: -r[2])[:30]:
        print(f"{r[0]:45s} exch={r[2]:3d} scans={r[1]:3d} {r[6]}")
    spark.stop()


if __name__ == "__main__":
    main()
