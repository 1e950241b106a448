#!/usr/bin/env python
"""r9 scale experiment: the round's new operators at 1x / 10x / 100x of
sf0.1 documents (shifted-copy corpus construction shared with the other
sweeps — copies are near-duplicates with a per-copy suffix token, so the
near-dup card has real clusters to count).

Measures, per multiplier:
  - bm25_topk (4 query terms, k=50) — expected ~linear: term-filtered
    explode + bounded aggs + TakeOrdered
  - corpus_data_card(components=auto-gated near-dup clustering) — the
    near-dup membership arm over a REAL clustering at scale
  - curate_md5 deterministic chain (exact dedup -> md5 buckets -> span
    surgery -> leakage-safe split) at 1x/10x only: it runs TWO full md5
    bucket clusterings by design (the audit/repro mode; production curation
    is the xxhash auto-gate, swept at 100x in sweep_autogate_100x.py)

Usage: python examples/sweep_r9ops_100x.py [multipliers...]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

CURATE_MD5_MAX_MULT = 10


def main() -> None:
    from analyst_toolkit_spark.ingest import load_table
    from analyst_toolkit_spark.llm import curate as C
    from analyst_toolkit_spark.llm import dedup as D
    from analyst_toolkit_spark.llm import text as T
    from analyst_toolkit_spark.session import get_spark

    spark = get_spark("sweep_r9ops")
    spark.range(1).write.format("noop").mode("overwrite").save()
    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    n_base = base.count()
    mults = [int(m) for m in sys.argv[1:]] or [1, 10, 100]
    print(f"base docs: {n_base}; multipliers: {mults}", flush=True)

    for m in mults:
        parts = [base]
        for i in range(1, m):
            parts.append(
                base.select(
                    (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(f" copytag{i}")).alias("text"),
                    "lang",
                    "source",
                    "n_chars",
                )
            )
        corpus = parts[0]
        for p in parts[1:]:
            corpus = corpus.unionByName(p)
        corpus = corpus.repartition(32).localCheckpoint(eager=True)
        n = corpus.count()

        t = time.time()
        T.bm25_topk(corpus, ["spark", "query", "join", "stream"], k=50).write.format(
            "noop"
        ).mode("overwrite").save()
        print(f"[{m}x {n} docs] bm25_topk: {time.time() - t:.1f}s", flush=True)

        t = time.time()
        comps, strategy = D.near_dedup_components(corpus)
        T.corpus_data_card(corpus, components=comps).write.format("noop").mode(
            "overwrite"
        ).save()
        print(
            f"[{m}x {n} docs] data_card+neardup ({strategy}): {time.time() - t:.1f}s",
            flush=True,
        )

        if m <= CURATE_MD5_MAX_MULT:
            t = time.time()
            bench = corpus.filter(F.col("doc_id") % 25 == 0).select("text")
            out, _ = C.curate_corpus(
                corpus.select("doc_id", "text"),
                exact_dedup=True,
                near_dedup_threshold=0.8,
                near_dedup_engine="md5_buckets",
                near_dedup_k=8,
                near_dedup_bands=4,
                benchmark=bench,
                decontaminate_mode="spans",
                splits={"train": 0.9, "val": 0.05, "test": 0.05},
                split_mode="leakage_safe",
            )
            kept = out.count()
            print(
                f"[{m}x {n} docs] curate_md5 chain: {time.time() - t:.1f}s "
                f"(survivors {kept})",
                flush=True,
            )


if __name__ == "__main__":
    main()
