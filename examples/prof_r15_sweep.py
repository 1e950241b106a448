"""r15: full-registry sweep — every queries() entry timed with the noop
sink plus its Spark job count, sorted by cost. The coverage net for the
optimization checklist: anything slow or job-heavy that the targeted
profilers missed shows up here.

Run: python examples/prof_r15_sweep.py [sf_dir] [n_runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analyst_toolkit_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("prof_r15_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    tracker = spark.sparkContext._jsc.sc().statusTracker()

    def jobs():
        return len(tracker.getJobIdsForGroup(None))

    results = []
    for name, fn in qs.items():
        spark.sparkContext.setJobDescription(name)
        try:
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
            samples, j0 = [], jobs()
            for _ in range(n):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                samples.append(time.perf_counter() - t0)
            jr = (jobs() - j0) / n
            results.append((min(samples), jr, name))
            print(f"{name:44s} best={min(samples):7.3f}s jobs/run={jr:.1f}", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"{name:44s} FAILED: {exc}", flush=True)
        finally:
            spark.sparkContext.setJobDescription(None)

    print("\n==== slowest 30 ====", flush=True)
    for t, jr, name in sorted(results, reverse=True)[:30]:
        print(f"{t:8.3f}s  jobs/run={jr:5.1f}  {name}", flush=True)
    print("\n==== most jobs/run 20 ====", flush=True)
    for t, jr, name in sorted(results, key=lambda r: -r[1])[:20]:
        print(f"{jr:5.1f} jobs/run  {t:8.3f}s  {name}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
