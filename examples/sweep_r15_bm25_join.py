#!/usr/bin/env python
"""r15 workload-scale sweep: per-query bm25_topk loop vs join-form
bm25_topk_join as the QUERY COUNT grows (10 / 50 / 200 queries against the
sf0.1 documents table).

The claim under test (r14 VERDICT "What's missing" #1): the per-query
operator pays one full plan — corpus tokenize, tf/df/stats aggregates,
score join, TakeOrdered — PER QUERY, so a retrieval workload's cost is
linear in |Q|; the join form pays the corpus-side work ONCE (per-(doc,
term) partials are query-independent) and adds only the tiny (query, term)
join, so wall-clock should stay ~flat until the workload's term set itself
dominates the hit volume.

Artifact rows: (n_queries, loop_sec, join_sec). Run:
  python examples/sweep_r15_bm25_join.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from analyst_toolkit_spark.ingest import load_table  # noqa: E402
from analyst_toolkit_spark.llm import text as T  # noqa: E402
from analyst_toolkit_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("sweep_r15_bm25_join")
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
    # warm the scan cache so the first timed point isn't paying IO warmup
    docs.count()

    print("n_queries,loop_sec,join_sec", flush=True)
    for n in (10, 50, 200):
        t0 = time.time()
        total = 0
        for qid, terms in workload[:n]:
            total += T.bm25_topk(docs, terms, k=10).count()
        loop_s = time.time() - t0

        qdf = spark.createDataFrame(
            workload[:n], "query_id long, terms array<string>"
        )
        t0 = time.time()
        jn = T.bm25_topk_join(docs, qdf, k=10).count()
        join_s = time.time() - t0
        assert jn == total, (jn, total)
        print(f"{n},{loop_s:.2f},{join_s:.2f}", flush=True)


if __name__ == "__main__":
    main()
