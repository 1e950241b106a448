"""r15 optimization round (session 4) — jobs/run + wall audit of every
HEADLINE bench query (guide §1: measure first). A headline query whose
jobs/run exceeds 1 + (its documented driver collects) is carrying a
redundant action; wall is secondary evidence (host weather).

Run: python examples/prof_r15_headline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analyst_toolkit_spark.session import get_spark  # noqa: E402


def _job_count(spark) -> int:
    ids = spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None)
    return len(ids)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("prof_r15_headline")
    spark.sparkContext.setLogLevel("ERROR")

    import bench
    import __spark_entry__ as entry

    qs = entry.queries()
    # warm footers/JIT once with the same probes the bench uses
    bench._cal_sec(spark, sf_dir)

    rows = []
    for name in bench.HEADLINE:
        fn = qs[name]
        # run 1: codegen-compile run (discard), run 2-3: measured
        spark.sparkContext.setJobDescription(name)
        bench._materialize(fn(spark, sf_dir))
        samples = []
        j0 = _job_count(spark)
        for _ in range(2):
            t0 = time.perf_counter()
            bench._materialize(fn(spark, sf_dir))
            samples.append(round(time.perf_counter() - t0, 3))
        jobs = (_job_count(spark) - j0) / 2
        spark.sparkContext.setJobDescription(None)
        rows.append((name, min(samples), jobs, samples))
        print(f"{name:35s} {min(samples):7.3f}s jobs/run={jobs:5.1f}  {samples}", flush=True)

    print("\n== sorted by jobs/run ==")
    for name, t, jobs, samples in sorted(rows, key=lambda r: -r[2]):
        print(f"{name:35s} jobs/run={jobs:5.1f} {t:7.3f}s")
    print("\n== sorted by wall ==")
    for name, t, jobs, samples in sorted(rows, key=lambda r: -r[1]):
        print(f"{name:35s} {t:7.3f}s jobs/run={jobs:5.1f}")
    spark.stop()


if __name__ == "__main__":
    main()
