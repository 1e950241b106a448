#!/usr/bin/env python
"""r15 persisted-BM25-index sweep: live bm25_topk_join (re-tokenizes the
corpus per workload) vs bm25_index_probe (reads ONLY the workload's term
buckets of a persisted posting layout) at sf0.1, 10/50/200-query workloads.

The claim under test: at retrieval time the corpus scan is the cost — the
index probe's wall should be roughly independent of how the corpus-side
work was amortized (it was paid once, at build), while the live operator
pays tokenize+tf+df per workload. Both return identical rows
(suite-asserted; the sweep asserts row counts agree).

Artifact rows: (n_queries, live_sec, probe_sec). Build cost printed once.
Run: python examples/sweep_r15_bm25_index.py
"""

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from analyst_toolkit_spark.ingest import load_table  # noqa: E402
from analyst_toolkit_spark.llm import incremental as I  # noqa: E402
from analyst_toolkit_spark.llm import text as T  # noqa: E402
from analyst_toolkit_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("sweep_r15_bm25_index")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    vocab = [
        r["token"]
        for r in T.build_vocab(docs, key="text", size=40).orderBy("token").collect()
    ]
    m = len(vocab)
    workload = [
        (i, [vocab[i % m], vocab[(3 * i + 1) % m], vocab[(7 * i + 2) % m]])
        for i in range(200)
    ]
    base = tempfile.mkdtemp(prefix="sweep_bm25_idx_")
    t0 = time.time()
    I.bm25_index_write(docs, base)
    print(f"index_build_sec,{time.time() - t0:.2f}", flush=True)
    docs.count()  # warm the live path's scan cache

    print("n_queries,live_sec,probe_sec", flush=True)
    for n in (10, 50, 200):
        qdf = spark.createDataFrame(
            workload[:n], "query_id long, terms array<string>"
        )
        t0 = time.time()
        live = T.bm25_topk_join(docs, qdf, k=10).count()
        live_s = time.time() - t0
        t0 = time.time()
        probe = I.bm25_index_probe(spark, base, qdf, k=10).count()
        probe_s = time.time() - t0
        assert live == probe, (live, probe)
        print(f"{n},{live_s:.2f},{probe_s:.2f}", flush=True)


if __name__ == "__main__":
    main()
