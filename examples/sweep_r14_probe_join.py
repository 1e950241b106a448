#!/usr/bin/env python
"""r14 workload-scale sweep: union-form ivf_probe_many vs join-form
ivf_probe_join as the QUERY COUNT grows (10 / 50 / 200 queries against the
same persisted raw-tier IVF index at sf0.1).

The claim under test (r13 VERDICT #1): the union form's cost is linear in
workload size — one plan branch + one driver-side centroid ranking per
query, so plan compile time and scheduling grow with |Q| — while the join
form is ONE fixed-shape plan whose only |Q|-dependence is the (tiny) query
relation itself, so wall-clock should stay ~flat until the scoring work
itself dominates.

Artifact rows: (n_queries, union_sec, join_sec). Run:
  python examples/sweep_r14_probe_join.py
"""

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from analyst_toolkit_spark.ingest import load_table  # noqa: E402
from analyst_toolkit_spark.llm import similarity as S  # noqa: E402
from analyst_toolkit_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("sweep_r14_probe_join")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, SF_DIR, "embeddings")
    assigned, centroids = S.ivf_build(emb, nlist=16)
    idx = tempfile.mkdtemp(prefix="sweep_ivf_join_")
    S.ivf_write(assigned, centroids, idx)

    qrows = emb.orderBy("vec_id").limit(200).collect()
    all_queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in qrows]

    # warm both code paths once (codegen + parquet footers), untimed
    S.ivf_probe_many(spark, idx, all_queries[:2], k=10, nprobe=4).count()
    wdf = spark.createDataFrame(all_queries[:2], "query_id long, query_vec array<double>")
    S.ivf_probe_join(spark, idx, wdf, k=10, nprobe=4).count()

    print("n_queries,union_sec,join_sec", flush=True)
    for n in (10, 50, 200):
        queries = all_queries[:n]
        t0 = time.perf_counter()
        nu = S.ivf_probe_many(spark, idx, queries, k=10, nprobe=4).count()
        t_union = time.perf_counter() - t0
        qdf = spark.createDataFrame(queries, "query_id long, query_vec array<double>")
        t0 = time.perf_counter()
        nj = S.ivf_probe_join(spark, idx, qdf, k=10, nprobe=4).count()
        t_join = time.perf_counter() - t0
        assert nu == nj == n * 10, (nu, nj)
        print(f"{n},{t_union:.2f},{t_join:.2f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
