#!/usr/bin/env python
"""Production retrieval-workload walkthrough (r14): build a persisted IVF
index once, then answer a QUERY WORKLOAD (a DataFrame of query vectors) with
the join-form batched probe — the shape a 100 TB deployment runs, where
per-query jobs or per-query plan branches cannot schedule.

Pipeline:
  1. ivf_build   — coarse quantizer (bounded driver k-means) + assignment
  2. ivf_write   — cluster-partitioned parquet + centroid sidecar
                   (keep_raw=True: SQ8 codes for cheap scoring, raw floats
                   retained for the refine re-rank — the FAISS refine recipe)
  3. ivf_probe_join — ONE fixed-shape plan for the whole workload:
                   centroid literal -> map-side per-query cluster ranking ->
                   statically pruned scan -> one equi-join -> two-bounded-
                   phase per-query top-k -> exact re-rank of the shortlist
  4. grade       — recall@10 vs brute-force cosine over the same corpus

Run: python examples/retrieval_production.py   (sf0.1, local)
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from analyst_toolkit_spark.ingest import load_table  # noqa: E402
from analyst_toolkit_spark.llm import similarity as S  # noqa: E402
from analyst_toolkit_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
K, NPROBE, REFINE = 10, 4, 2


def main() -> None:
    spark = get_spark("retrieval_production")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, SF_DIR, "embeddings")

    t0 = time.perf_counter()
    assigned, centroids = S.ivf_build(emb, nlist=16)
    idx = tempfile.mkdtemp(prefix="retrieval_idx_")
    S.ivf_write(assigned, centroids, idx, quantize="sq8", keep_raw=True)
    print(f"index: nlist=16 sq8+raw written in {time.perf_counter() - t0:.1f}s", flush=True)

    # the workload: 100 query vectors as a DataFrame — in production this is
    # whatever upstream produced (a parquet of user/query embeddings)
    workload = (
        emb.orderBy("vec_id")
        .limit(100)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
        .localCheckpoint(eager=True)
    )

    t0 = time.perf_counter()
    hits = S.ivf_probe_join(
        spark, idx, workload, k=K, nprobe=NPROBE, refine_factor=REFINE
    ).localCheckpoint(eager=True)
    n = hits.count()
    t_probe = time.perf_counter() - t0
    print(f"probe: {n} result rows for 100 queries in {t_probe:.1f}s (one plan, one join)", flush=True)

    # grade against exact brute force (the expensive thing the index avoids)
    queries = [(int(r["query_id"]), [float(x) for x in r["query_vec"]]) for r in workload.collect()]
    exact: dict[int, set] = {}
    for qid, qvec in queries:
        exact[qid] = {r["vec_id"] for r in S.cosine_topk(emb, qvec, k=K).collect()}
    got: dict[int, set] = {}
    for r in hits.collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(got.get(q, set()) & exact[q]) / K for q in exact]
    print(
        f"recall@{K} over 100 queries: mean={sum(recalls) / len(recalls):.3f} "
        f"min={min(recalls):.2f} (nprobe={NPROBE}/{16}, refine={REFINE})",
        flush=True,
    )

    # 5. HYBRID: fuse the semantic ANN list with a lexical BM25 list (RRF) —
    # the rankings live on incomparable scales; rank reciprocals fuse them
    from analyst_toolkit_spark.llm import text as T

    docs = load_table(spark, SF_DIR, "documents")
    lex = T.bm25_topk(docs, ["spark", "query", "join", "stream"], k=50)
    one_query = hits.filter(F.col("query_id") == 0).select(
        F.col("vec_id").alias("doc_id"), "cosine"
    )
    fused = S.rrf_fuse([(lex, "score"), (one_query, "cosine")], k=60, topk=10)
    rows = fused.collect()
    both = sum(1 for r in rows if r["n_lists"] == 2)
    print(
        f"hybrid RRF top-10 for query 0: {len(rows)} rows, {both} ranked by "
        f"BOTH lists (lexical+semantic)",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
