"""r12 refine-dial grade at 10x embeddings (r11 VERDICT #2 "Done" criterion).

Same 10x corpus + boundary-straddling midpoint queries as the r11 ANN sweep
(examples/sweep_r11_100x.py Part B — 20k vectors, nlist=16, queries are
midpoints of base-vector pairs so their true top-10 straddles two cells).
Indexes written keep_raw=True; every tier graded at:

  - plain   nprobe=4              (the r11 baseline: recall 0.58-0.66)
  - refine2 nprobe=4, refine=2    (8/16 partitions scanned cheap, k*2
                                   shortlist exact-re-ranked on raw)
  - refine4 nprobe=4, refine=4    (16/16 — exhaustive cheap scan + re-rank;
                                   the "crank the dial to exact" endpoint)

Done = recall@10 >= 0.9 with refine on (refine4 for every tier; refine2
records the intermediate dial position honestly).
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import functions as F

from analyst_toolkit_spark.ingest import load_table
from analyst_toolkit_spark.llm import similarity as S
from analyst_toolkit_spark.session import get_spark


def main() -> None:
    spark = get_spark("sweep_r12_refine")
    spark.sparkContext.setLogLevel("ERROR")

    emb_base = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    eparts = [emb_base.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))]
    for i in range(1, 10):
        eparts.append(
            emb_base.select(
                (F.col("vec_id") + i * 1_000_000).alias("vec_id"),
                F.transform(
                    F.col("embedding").cast("array<double>"),
                    lambda x, j: x + (F.xxhash64(F.col("vec_id") + i * 1_000_000, j) % 997).cast("double") / 9970.0,
                ).alias("embedding"),
            )
        )
    emb = eparts[0]
    for p in eparts[1:]:
        emb = emb.unionByName(p)
    emb = emb.repartition(32).localCheckpoint(eager=True)
    en = emb.count()
    print(f"embeddings 10x: {en} vectors", flush=True)

    t = time.time()
    assigned, centroids = S.ivf_build(emb, nlist=16)
    print(f"ivf_build(nlist=16): {time.time() - t:.1f}s", flush=True)
    idx = {}
    for tier in ("raw", "sq8", "pq"):
        t = time.time()
        idx[tier] = tempfile.mkdtemp(prefix=f"sweep_refine_{tier}_")
        S.ivf_write(assigned, centroids, idx[tier], quantize=tier, keep_raw=True)
        print(f"ivf_write({tier}, keep_raw): {time.time() - t:.1f}s", flush=True)

    base_vecs = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 10).orderBy("vec_id").collect()
    ]
    queries = [
        [(a + b) / 2.0 for a, b in zip(base_vecs[2 * i], base_vecs[2 * i + 1])]
        for i in range(5)
    ]
    t = time.time()
    exact = [
        {r["vec_id"] for r in S.cosine_topk(emb, q, k=10).collect()} for q in queries
    ]
    print(f"brute_force_topk x5: {time.time() - t:.1f}s", flush=True)

    for tier in ("raw", "sq8", "pq"):
        for mode, rf in (("plain", 0), ("refine2", 2), ("refine4", 4)):
            t = time.time()
            recs = []
            for q, ex in zip(queries, exact):
                got = {
                    r["vec_id"]
                    for r in S.ivf_probe(
                        spark, idx[tier], q, k=10, nprobe=4, refine_factor=rf
                    ).collect()
                }
                recs.append(len(got & ex) / 10.0)
            print(
                f"[{tier} {mode}] x5: {time.time() - t:.1f}s, recall@10 "
                f"mean={sum(recs) / len(recs):.2f} min={min(recs):.2f}",
                flush=True,
            )

    spark.stop()


if __name__ == "__main__":
    main()
