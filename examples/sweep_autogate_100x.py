#!/usr/bin/env python
"""r8 scale experiment (VERDICT r7 directive #7): re-run the extreme-
duplication corpus through the AUTO-GATED curate chain end-to-end and
record (census estimate, census seconds, chosen strategy, end-to-end
seconds) at 1x / 10x / 100x of sf0.1 documents.

Corpus construction mirrors the r6 100x sweep: m shifted copies of the
sf0.1 documents table. Each copy appends a tiny per-copy token to the text
so copies are NEAR-duplicates (Jaccard >= ~0.9 for real docs) that survive
the exact-dedup stage and exercise the near-dedup gate — the regime the
r6 sweep measured the pair/bucket crossover in (159.6 s pairs vs 63.7 s
buckets at 100x, pre-gate).

Usage: python examples/sweep_autogate_100x.py [multipliers...]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")


def main() -> None:
    import __spark_entry__  # noqa: F401  (sys.path side effects only)
    from analyst_toolkit_spark.ingest import load_table
    from analyst_toolkit_spark.llm import curate as L_cur
    from analyst_toolkit_spark.llm import dedup as D
    from analyst_toolkit_spark.session import get_spark

    spark = get_spark("sweep_autogate")
    base = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text"
    )
    n_base = base.count()
    mults = [int(m) for m in sys.argv[1:]] or [1, 10, 100]
    print(f"base docs: {n_base}; multipliers: {mults}", flush=True)

    for m in mults:
        copies = [
            base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" copytoken{i}")).alias("text"),
            )
            for i in range(m)
        ]
        corpus = copies[0]
        for c in copies[1:]:
            corpus = corpus.unionAll(c)
        corpus = corpus.repartition(32).localCheckpoint(eager=True)
        n = corpus.count()

        t0 = time.perf_counter()
        est = D.candidate_pair_census(corpus)
        census_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        out, report = L_cur.curate_corpus(
            corpus,
            min_quality=0.2,
            max_repetition=0.5,
            exact_dedup=True,
            near_dedup_threshold=0.8,
        )
        kept = out.count()
        chain_s = time.perf_counter() - t0
        strategy = report["near_dedup"]["method"]
        print(
            f"m={m}x docs={n} census_est={est} census_s={census_s:.1f} "
            f"strategy={strategy} chain_s={chain_s:.1f} kept={kept}",
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()
