"""r16 (r15 VERDICT #4): evaluate the RocksDB state-store provider on the
heaviest correctness rows (stream-stream interval joins, 4 state stores).

Same-session interleaved A/B: the provider class is read per query start,
so alternating runs compare under identical host weather. State partition
count is untouched (shrinking it would be the banned local-core tune).
"""
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

from analyst_toolkit_spark.session import get_spark  # noqa: E402

spark = get_spark("prof_r16_rocksdb")
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as entry  # noqa: E402

qs = entry.queries()
SF = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
ROCKS = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
HDFS = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
ROWS = ["events_stream_stream_left", "events_stream_stream_join", "events_stream_sessions"]

for name in ROWS:
    fn = qs[name]
    fn(spark, SF).write.format("noop").mode("overwrite").save()  # warm (default provider)
    res = {HDFS: [], ROCKS: []}
    for _ in range(3):
        for prov in (HDFS, ROCKS):
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prov)
            t0 = time.time()
            fn(spark, SF).write.format("noop").mode("overwrite").save()
            res[prov].append(round(time.time() - t0, 2))
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", HDFS)
    print(f"{name}: hdfs={sorted(res[HDFS])} rocksdb={sorted(res[ROCKS])}", flush=True)
