"""r12 grouped_topk 1x/10x/100x sweep — the rewrite's scale claim, measured.

The r12 grouped_topk ranks on (group, order keys) only and joins the full
rows back by broadcast winners, so the payload (the document text) never
rides a ranking shuffle. This sweep prices top-100-per-source over the
sf0.1 documents corpus duplicated 1x/10x/100x (same vocab-shifted copy
construction as the r11 sweeps — source skew preserved), quality-scored on
the fly. Expected shape: near-linear in the scan (the two ranking shuffles
carry only (source, q, doc_id) labels; winners stay 100 × n_sources rows
regardless of corpus size).

  PYTHONPATH=/root/repo python examples/sweep_r12_topk.py [mults...]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from analyst_toolkit_spark.ingest import load_table
from analyst_toolkit_spark.llm import pack as P
from analyst_toolkit_spark.llm import text as T
from analyst_toolkit_spark.session import get_spark


def main() -> None:
    spark = get_spark("sweep_r12_topk")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).write.format("noop").mode("overwrite").save()
    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    mults = [int(m) for m in sys.argv[1:]] or [1, 10, 100]

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for m in mults:
        parts = [base]
        for i in range(1, m):
            parts.append(
                base.select(
                    (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
                    F.regexp_replace("text", r"([A-Za-z0-9']+)", f"c{i}x$1").alias("text"),
                    "lang", "source", "n_chars",
                )
            )
        corpus = parts[0]
        for p in parts[1:]:
            corpus = corpus.unionByName(p)
        corpus = corpus.repartition(32).localCheckpoint(eager=True)
        n = corpus.count()
        scored = corpus.withColumn("q", T.quality_score("text"))
        t = time.time()
        noop(P.grouped_topk(scored, 100, ["q", "doc_id"], "source"))
        print(f"[{m}x {n} docs] grouped_topk(k=100, by source): {time.time() - t:.1f}s", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
