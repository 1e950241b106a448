#!/usr/bin/env python
"""Late-r8 scale experiment: the three newest corpus operators at
1x / 10x / 100x of sf0.1 documents (same shifted-copy corpus construction
as sweep_autogate_100x.py — copies are near-duplicates with a per-copy
suffix token, so the leakage-safe split has real cross-copy clusters to
keep atomic).

Measures, per multiplier:
  - corpus_data_card (per-source roll-up; doc bodies never shuffle)
  - leakage_safe_split over auto-gated near-dup components, plus the
    atomicity audit (max distinct splits per component — must be 1)
  - oov_rate (budget-500 vocab)

Usage: python examples/sweep_newops_100x.py [multipliers...]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")


def main() -> None:
    from analyst_toolkit_spark.ingest import load_table
    from analyst_toolkit_spark.llm import dedup as D
    from analyst_toolkit_spark.llm import text as T
    from analyst_toolkit_spark.session import get_spark

    spark = get_spark("sweep_newops")
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
        corpus_card = T.corpus_data_card(corpus)
        corpus_card.write.format("noop").mode("overwrite").save()
        t_card = time.time() - t

        t = time.time()
        comps, strategy = D.near_dedup_components(corpus)
        split = T.leakage_safe_split(corpus, comps)
        split.write.format("noop").mode("overwrite").save()
        t_split = time.time() - t
        # atomicity audit: every component maps to exactly one split
        worst = (
            split.join(comps, split["doc_id"] == comps["node"])
            .groupBy("component")
            .agg(F.countDistinct("split").alias("k"))
            .agg(F.max("k").alias("worst"))
            .collect()[0]["worst"]
        )

        t = time.time()
        T.oov_rate(corpus).write.format("noop").mode("overwrite").save()
        t_oov = time.time() - t

        print(
            f"m={m} docs={n} data_card={t_card:.1f}s "
            f"split={t_split:.1f}s (strategy={strategy}, max_splits_per_cluster={worst}) "
            f"oov={t_oov:.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
