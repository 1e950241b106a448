"""r16 (r15 VERDICT #7): the sub-1.0 8-vs-32-core scaling ratios
(range_join_bands 0.61, asof_join_events 0.67, embedding_ivf_topk 0.80 in
PERF_r15) — hypothesis: AQE's coalescePartitions.parallelismFirst=true
refuses to coalesce tiny post-shuffle partitions below the core count, so
32 cores pay more task overhead than the data justifies.

Runs the three queries (plus two mid-size controls) under
parallelismFirst true/false in separate processes (static conf), at the
core count given by $SPARK_GRAFT_CPUS. Invoke once per (cores, flag) pair:

  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_AQE_PARALLELISM_FIRST=true  python examples/prof_r16_scaling.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

from analyst_toolkit_spark.session import get_spark  # noqa: E402

spark = get_spark("prof_r16_scaling")
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as entry  # noqa: E402

qs = entry.queries()
SF = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
ROWS = [
    "range_join_bands", "asof_join_events", "embedding_ivf_topk",
    # controls: mid-size shuffles that MUST not regress at 32 cores
    "dedup_keep_first_lineitem", "events_sessions", "pipeline_orders",
]
cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
pf = os.environ.get("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true")
out = {}
for name in ROWS:
    fn = qs[name]
    fn(spark, SF).write.format("noop").mode("overwrite").save()  # warm
    ts = []
    for _ in range(3):
        t0 = time.time()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        ts.append(round(time.time() - t0, 3))
    out[name] = sorted(ts)
print(f"RESULT cpus={cpus} parallelismFirst={pf} " + " ".join(
    f"{k}={v}" for k, v in out.items()), flush=True)
